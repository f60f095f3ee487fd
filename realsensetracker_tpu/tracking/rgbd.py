"""Frame-to-frame RGB-D visual odometry (joint geometry + photometry).

The colored counterpart of tracking/frame_to_frame.py: per frame, register
the current depth+intensity pair against the previous one with the combined
point-to-plane + photometric objective (align/rgbd.py), compose into the
global pose, and hold the reference frame on failure -- the reference's
replay-loop semantics (rs_replay_app.cpp:211-298) with the color stream
(rs_driver.cpp:33-103) finally consumed by the tracker instead of only the
viewer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.align import rgbd as rgbd_mod
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.tracking.frame_to_frame import FrameResult
from realsensetracker_tpu.tracking.trajectory import Trajectory


@dataclass
class RgbdTracker:
    """Stateful streaming tracker: (depth, gray) frames in -> poses out."""

    intr: camera.Intrinsics
    cfg: rgbd_mod.RgbdIcpConfig = rgbd_mod.RgbdIcpConfig()
    min_inlier_fraction: float = 0.2

    _prev_target: object = field(default=None, repr=False)
    _pose: object = field(default=None, repr=False)
    _index: int = 0
    trajectory: Trajectory = field(default_factory=Trajectory)

    def reset(self) -> None:
        self._prev_target = None
        self._pose = None
        self._index = 0
        self.trajectory = Trajectory()

    @property
    def pose(self):
        return self._pose

    def process(self, depth, gray, timestamp: float | None = None) -> FrameResult:
        depth = jnp.asarray(depth, jnp.float32)
        gray = jnp.asarray(gray, jnp.float32)
        if timestamp is None:
            timestamp = float(self._index)

        # Destination-side preproc is kept for the NEXT frame (each frame is
        # preprocessed exactly once, as dst; src-side is sampled on the fly).
        target = rgbd_mod.build_rgbd_target(depth, gray, self.intr, self.cfg)

        if self._prev_target is None:
            self._pose = se3.identity()
            self._prev_target = target
            self.trajectory.append(timestamp, self._pose)
            res = FrameResult(self._pose, se3.identity(), True, 0.0, 1.0, self._index)
            self._index += 1
            return res

        dst_levels, dst_grays, intrs = self._prev_target
        src_samples = rgbd_mod.sample_rgbd_source(depth, gray, intrs, self.cfg)
        out = rgbd_mod.rgbd_icp_sampled(
            src_samples, dst_levels, dst_grays, intrs, cfg=self.cfg
        )
        inlier = float(out.inlier_fraction)
        success = bool(np.isfinite(np.asarray(out.transform)).all()) and (
            inlier >= self.min_inlier_fraction
        )
        if success:
            # Orthonormalized accumulation in one jitted dispatch.
            self._pose = se3.accumulate(self._pose, out.transform)
            self._prev_target = target
        self.trajectory.append(timestamp, self._pose)
        res = FrameResult(
            pose=self._pose,
            relative=out.transform,
            success=success,
            rmse=float(out.rmse),
            inlier_fraction=inlier,
            frame_index=self._index,
        )
        self._index += 1
        return res
