"""Frame-to-frame visual odometry driver (BASELINE config 2).

Host-side port of the rs_replay_app main loop (rs_replay_app.cpp:211-298):
per frame, register the current depth frame against the previous one,
compose the result into the global pose, feed the world model, and keep the
old reference frame on failure ("ALIGNMENT FAILED!!", :266-273). The
per-frame compute (pyramid + projective ICP + map insert) is all jitted; the
Python layer only sequences frames and holds the tiny pose state.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.align import projective
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.ops.cloud import Cloud
from realsensetracker_tpu.tracking import accumulator as acc_mod
from realsensetracker_tpu.tracking.trajectory import Trajectory


class FrameResult(NamedTuple):
    pose: jnp.ndarray  # (4, 4) world_from_camera
    relative: jnp.ndarray  # (4, 4) prev_from_curr
    success: bool
    rmse: float
    inlier_fraction: float
    frame_index: int


@dataclass
class FrameToFrameTracker:
    """Stateful streaming tracker: depth frames in -> world poses out."""

    intr: camera.Intrinsics
    cfg: projective.ProjectiveIcpConfig = projective.ProjectiveIcpConfig()
    min_inlier_fraction: float = 0.2  # tracking-failure gate
    map_capacity: int = 0  # 0 disables the world model
    map_voxel_size: float = 0.05
    map_points_per_frame: int = 4096

    _prev_levels: object = field(default=None, repr=False)
    _pose: object = field(default=None, repr=False)
    _map: object = field(default=None, repr=False)
    _index: int = 0
    trajectory: Trajectory = field(default_factory=Trajectory)

    def reset(self) -> None:
        self._prev_levels = None
        self._pose = None
        self._map = None
        self._index = 0
        self.trajectory = Trajectory()

    @property
    def pose(self):
        return self._pose

    @property
    def world_map(self):
        return self._map

    def process(self, depth, timestamp: float | None = None) -> FrameResult:
        from realsensetracker_tpu.ops.pyramid import build_pyramid

        depth = jnp.asarray(depth)
        num_levels = len(self.cfg.iters)
        levels, intrs = build_pyramid(
            depth, self.intr, num_levels, self.cfg.min_depth, self.cfg.max_depth
        )
        if timestamp is None:
            timestamp = float(self._index)

        if self._prev_levels is None:
            # Initialization branch (rs_replay_app.cpp:236-240).
            self._pose = se3.identity()
            self._prev_levels = levels
            self._intrs = tuple(intrs)
            if self.map_capacity:
                self._map = acc_mod.init_map(self.map_capacity)
                self._map = self._insert(levels, self._pose)
            self.trajectory.append(timestamp, self._pose)
            res = FrameResult(
                pose=self._pose,
                relative=se3.identity(),
                success=True,
                rmse=0.0,
                inlier_fraction=1.0,
                frame_index=self._index,
            )
            self._index += 1
            return res

        # Register curr (src) onto prev (dst): T maps curr -> prev coords.
        icp = projective.projective_icp(levels, self._prev_levels, self._intrs, cfg=self.cfg)
        inlier = float(icp.inlier_fraction)
        success = bool(np.isfinite(np.asarray(icp.transform)).all()) and (
            inlier >= self.min_inlier_fraction
        )
        if success:
            # Pose composition (rs_replay_app.cpp:267) + model insert (:268);
            # orthonormalized so per-frame rounding cannot accumulate into
            # R denormalization over long streams (one jitted dispatch).
            self._pose = se3.accumulate(self._pose, icp.transform)
            self._prev_levels = levels
            if self.map_capacity:
                self._map = self._insert(levels, self._pose)
        # On failure: hold pose AND keep the previous reference frame
        # (rs_replay_app.cpp:271-273).
        self.trajectory.append(timestamp, self._pose)
        res = FrameResult(
            pose=self._pose,
            relative=icp.transform,
            success=success,
            rmse=float(icp.rmse),
            inlier_fraction=inlier,
            frame_index=self._index,
        )
        self._index += 1
        return res

    def _insert(self, levels, pose):
        pts, _, ok = projective.sample_level(levels[0], self.map_points_per_frame)
        return acc_mod.add_cloud(
            self._map, pose, Cloud(points=pts, mask=ok), self.map_voxel_size
        )
