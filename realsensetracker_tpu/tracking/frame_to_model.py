"""Frame-to-model tracking: register each frame against the world model.

The reference sketches this in a compiled-out branch
(rs_replay_app.cpp:274-287): downsample the current cloud and AlignIcp3d it
against CloudAccumulator::ExtractPointCloud(), then insert. Frame-to-model
drifts less than frame-to-frame because the reference surface is the fused
map, not the previous noisy frame.

TPU realization: the device-resident MapAccumulator IS a fixed-capacity
masked cloud, so GNC-ICP runs against it directly (MXU brute-force NN);
everything stays on device between frames.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.align import icp as icp_mod
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.ops import cloud as cloud_mod
from realsensetracker_tpu.ops import voxel as voxel_mod
from realsensetracker_tpu.tracking import accumulator as acc_mod
from realsensetracker_tpu.tracking.frame_to_frame import FrameResult
from realsensetracker_tpu.tracking.trajectory import Trajectory


@dataclass
class FrameToModelTracker:
    """Streaming tracker registering every frame against the fused map."""

    intr: camera.Intrinsics
    voxel_size: float = 0.05  # rs_replay_app.cpp:279
    icp_max_iter: int = 64
    frame_capacity: int = 4096
    model_capacity: int = 32768
    max_mean_cost: float = 0.25  # tracking-failure gate (meters RMS)

    _pose: object = field(default=None, repr=False)
    _model: object = field(default=None, repr=False)
    _index: int = 0
    trajectory: Trajectory = field(default_factory=Trajectory)

    @property
    def pose(self):
        return self._pose

    @property
    def world_map(self):
        return self._model

    def _frame_cloud(self, depth) -> cloud_mod.Cloud:
        depth = jnp.asarray(depth, jnp.float32)
        valid = camera.valid_mask(depth, 0.05, 10.0)
        verts = camera.unproject_depth(jnp.where(valid, depth, 0.0), self.intr)
        h, w = depth.shape
        c = cloud_mod.Cloud(verts.reshape(h * w, 3), valid.reshape(h * w))
        c = voxel_mod.downsample_voxel(c, self.voxel_size)
        cap = self.frame_capacity
        return cloud_mod.Cloud(points=c.points[:cap], mask=c.mask[:cap])

    def process(self, depth, timestamp: float | None = None) -> FrameResult:
        if timestamp is None:
            timestamp = float(self._index)
        curr = self._frame_cloud(depth)

        if self._model is None:
            self._pose = se3.identity()
            self._model = acc_mod.init_map(self.model_capacity)
            self._model = acc_mod.add_cloud(self._model, self._pose, curr, self.voxel_size)
            self.trajectory.append(timestamp, self._pose)
            res = FrameResult(self._pose, se3.identity(), True, 0.0, 1.0, self._index)
            self._index += 1
            return res

        # Register the frame (camera coords) onto the WORLD-frame model,
        # seeded from the previous pose (ref branch seeds implicitly by
        # registering downsampled frame to total_cloud).
        out = icp_mod.align_icp(
            curr, self._model.extract_cloud(), self.icp_max_iter,
            init_transform=self._pose,
        )
        ok = bool(np.isfinite(np.asarray(out.transform)).all()) and (
            float(out.mean_cost) < self.max_mean_cost
        )
        if ok:
            # absolute world_from_camera; orthonormalized because the pose
            # seeds the next frame's registration (feedback loop -- see
            # se3.orthonormalize).
            self._pose = se3.orthonormalize(out.transform)
            self._model = acc_mod.add_cloud(self._model, self._pose, curr, self.voxel_size)
        self.trajectory.append(timestamp, self._pose)
        res = FrameResult(
            pose=self._pose,
            relative=out.transform,
            success=ok,
            rmse=float(out.mean_cost),
            inlier_fraction=1.0 if ok else 0.0,
            frame_index=self._index,
        )
        self._index += 1
        return res
