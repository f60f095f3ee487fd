"""Frame-to-keyframe tracking (BASELINE config 3).

The reference sketches frame-to-model registration in a disabled branch
(rs_replay_app.cpp:274-287); the standard production form is
frame-to-KEYFRAME: register every frame against a held keyframe (less drift
than frame-to-frame), promoting the current frame to keyframe when motion or
overlap crosses a threshold. Same failure semantics as the replay loop:
a failed registration keeps both the pose and the keyframe.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.align import projective
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.tracking.trajectory import Trajectory


class KeyframeResult(NamedTuple):
    pose: jnp.ndarray  # world_from_camera
    success: bool
    is_new_keyframe: bool
    rmse: float
    inlier_fraction: float
    frame_index: int


@dataclass
class KeyframeTracker:
    intr: camera.Intrinsics
    cfg: projective.ProjectiveIcpConfig = projective.ProjectiveIcpConfig()
    min_inlier_fraction: float = 0.2
    # Promote keyframe when relative motion exceeds these bounds:
    max_translation: float = 0.15  # meters
    max_rotation: float = 0.15  # radians
    min_overlap: float = 0.6  # inlier fraction below this forces a keyframe
    # Lost-tracking recovery: after this many consecutive failures the
    # CURRENT frame becomes the keyframe (pose held). Without this a
    # transient degeneracy (e.g. a featureless-wall stretch) leaves the
    # tracker registering against an ever-staler keyframe forever; with
    # it, tracking resumes as soon as content returns and the SLAM
    # layer's loop closure can re-anchor the accumulated drift.
    max_consecutive_failures: int = 5

    _fail_streak: int = 0
    _kf_levels: object = field(default=None, repr=False)
    _kf_pose: object = field(default=None, repr=False)  # world_from_keyframe
    _pose: object = field(default=None, repr=False)
    _index: int = 0
    trajectory: Trajectory = field(default_factory=Trajectory)

    @property
    def pose(self):
        return self._pose

    def process(self, depth, timestamp: float | None = None) -> KeyframeResult:
        from realsensetracker_tpu.ops.pyramid import build_pyramid

        depth = jnp.asarray(depth)
        levels, intrs = build_pyramid(
            depth, self.intr, len(self.cfg.iters), self.cfg.min_depth, self.cfg.max_depth
        )
        if timestamp is None:
            timestamp = float(self._index)

        if self._kf_levels is None:
            self._pose = se3.identity()
            self._kf_pose = self._pose
            self._kf_levels = levels
            self._intrs = tuple(intrs)
            self.trajectory.append(timestamp, self._pose)
            res = KeyframeResult(self._pose, True, True, 0.0, 1.0, self._index)
            self._index += 1
            return res

        # Warm-start from the last pose relative to the keyframe.
        init = se3.compose(se3.inverse(self._kf_pose), self._pose)
        icp = projective.projective_icp(
            levels, self._kf_levels, self._intrs, init_transform=init, cfg=self.cfg
        )
        inlier = float(icp.inlier_fraction)
        success = bool(np.isfinite(np.asarray(icp.transform)).all()) and (
            inlier >= self.min_inlier_fraction
        )
        is_new_kf = False
        if success:
            self._fail_streak = 0
            # orthonormalize: the warm-start feedback loop amplifies any
            # rotation denormalization exponentially (se3.orthonormalize);
            # se3.accumulate keeps it one jitted dispatch per frame.
            self._pose = se3.accumulate(self._kf_pose, icp.transform)
            tw = np.asarray(se3.log(icp.transform))
            if (
                np.linalg.norm(tw[:3]) > self.max_translation
                or np.linalg.norm(tw[3:]) > self.max_rotation
                or inlier < self.min_overlap
            ):
                self._kf_levels = levels
                self._kf_pose = self._pose
                is_new_kf = True
        else:
            self._fail_streak += 1
            if self._fail_streak >= self.max_consecutive_failures:
                # Recovery re-seed: pose held, current frame becomes the
                # reference so tracking can resume.
                self._fail_streak = 0
                self._kf_levels = levels
                self._kf_pose = self._pose
                is_new_kf = True
        self.trajectory.append(timestamp, self._pose)
        res = KeyframeResult(
            pose=self._pose,
            success=success,
            is_new_keyframe=is_new_kf,
            rmse=float(icp.rmse),
            inlier_fraction=inlier,
            frame_index=self._index,
        )
        self._index += 1
        return res
