"""Public tracking facade: frames in -> poses out.

The stable API the reference exposes through RsViewer/RsDriver + the app
loops; here a single Tracker object selects the backend (projective ICP,
keyframe tracking, frame-to-model, reference-semantics GNC-ICP, or GICP)
and manages the trajectory + optional world model.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.api.config import TrackerConfig
from realsensetracker_tpu.geometry import se3
from realsensetracker_tpu.ops import cloud as cloud_mod
from realsensetracker_tpu.ops import voxel as voxel_mod
from realsensetracker_tpu.ops.pyramid import build_pyramid
from realsensetracker_tpu.tracking.frame_to_frame import FrameToFrameTracker
from realsensetracker_tpu.tracking.keyframe import KeyframeTracker
from realsensetracker_tpu.tracking.trajectory import Trajectory


class Tracker:
    """Streaming RGB-D tracker with selectable registration backend."""

    def __init__(self, config: TrackerConfig | None = None):
        self.config = config or TrackerConfig()
        method = self.config.method
        if method == "projective":
            self._impl = FrameToFrameTracker(
                self.config.intrinsics,
                self.config.projective,
                min_inlier_fraction=self.config.min_inlier_fraction,
                map_capacity=self.config.map_capacity,
                map_voxel_size=self.config.map_voxel_size,
            )
        elif method == "keyframe":
            self._impl = KeyframeTracker(
                self.config.intrinsics,
                self.config.projective,
                min_inlier_fraction=self.config.min_inlier_fraction,
            )
        elif method == "model":
            from realsensetracker_tpu.tracking.frame_to_model import FrameToModelTracker

            self._impl = FrameToModelTracker(
                self.config.intrinsics,
                voxel_size=self.config.map_voxel_size,
                icp_max_iter=self.config.align.icp_max_iter,
            )
        elif method == "rgbd":
            from realsensetracker_tpu.tracking.rgbd import RgbdTracker

            self._impl = RgbdTracker(
                self.config.intrinsics,
                self.config.rgbd,
                min_inlier_fraction=self.config.min_inlier_fraction,
            )
        elif method in ("icp", "gicp"):
            self._impl = _CloudTracker(self.config)
        else:
            raise ValueError(f"unknown tracking method: {method}")

    def process(self, depth, timestamp: float | None = None, color=None):
        """One frame in -> FrameResult-like record out.

        `color` feeds the photometric term of method="rgbd": an (H, W) gray
        image in [0, 1], or an (H, W, 3) image ([0,1] float or uint8) reduced
        to BT.601 luma. Other methods ignore it.
        """
        if self.config.method == "rgbd":
            if color is None:
                raise ValueError("method='rgbd' requires a color/gray frame")
            return self._impl.process(depth, _as_gray(color), timestamp)
        return self._impl.process(depth, timestamp)

    @property
    def pose(self):
        return self._impl.pose

    @property
    def trajectory(self) -> Trajectory:
        return self._impl.trajectory

    @property
    def world_map(self):
        return getattr(self._impl, "world_map", None)

    def save_trajectory(self, path: str) -> None:
        self.trajectory.save_tum(path)


def _as_gray(color):
    """(H, W) gray | (H, W, 3) RGB -> [0, 1] float32 luma (BT.601).

    uint8 inputs scale by 1/255 in BOTH arities: the photometric term
    (align/rgbd.py) assumes [0, 1] intensities (photo_huber, photo_weight
    are calibrated in those units), so an unscaled 0-255 grayscale would
    silently destroy the geometric/photometric balance.
    """
    arr = np.asarray(color)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    if arr.ndim == 2:
        return arr.astype(np.float32)
    return arr.astype(np.float32) @ np.asarray([0.299, 0.587, 0.114], np.float32)


class _CloudTracker:
    """Cloud-based backends: the reference replay-loop semantics
    (rs_replay_app.cpp:244-273) with GNC-ICP or GICP registration on
    voxel-downsampled clouds."""

    def __init__(self, config: TrackerConfig):
        self.config = config
        self._prev = None
        self._pose = None
        self._index = 0
        self.trajectory = Trajectory()

    @property
    def pose(self):
        return self._pose

    def _depth_to_cloud(self, depth):
        cfg = self.config
        levels, _ = build_pyramid(jnp.asarray(depth), cfg.intrinsics, 1)
        h, w = levels[0].valid.shape
        pts = levels[0].vertex_map.reshape(h * w, 3)
        ok = levels[0].vertex_valid.reshape(h * w)
        c = cloud_mod.Cloud(points=pts, mask=ok)
        c = voxel_mod.downsample_voxel(c, cfg.align.voxel_size)
        cap = cfg.align.cloud_capacity
        return cloud_mod.Cloud(points=c.points[:cap], mask=c.mask[:cap])

    def process(self, depth, timestamp: float | None = None):
        from realsensetracker_tpu.align import gicp as gicp_mod
        from realsensetracker_tpu.align import icp as icp_mod
        from realsensetracker_tpu.tracking.frame_to_frame import FrameResult

        if timestamp is None:
            timestamp = float(self._index)
        curr = self._depth_to_cloud(depth)
        if self._prev is None:
            self._pose = se3.identity()
            self._prev = curr
            self.trajectory.append(timestamp, self._pose)
            res = FrameResult(self._pose, se3.identity(), True, 0.0, 1.0, self._index)
            self._index += 1
            return res

        if self.config.method == "icp":
            out = icp_mod.align_icp(curr, self._prev, self.config.align.icp_max_iter)
            rel, ok, cost = out.transform, bool(out.success), float(out.mean_cost)
        else:
            g = self.config.gicp
            out = gicp_mod.align_gicp(
                curr, self._prev,
                max_outer=g.max_outer, inner_iters=g.inner_iters,
                cov_k=g.cov_k, use_gicp_cov=g.use_gicp_cov,
                huber_delta=g.huber_delta,
            )
            rel, cost = out.transform, float(out.cost)
            ok = bool(np.isfinite(np.asarray(rel)).all())

        if ok:
            self._pose = se3.compose(self._pose, rel)
            self._prev = curr
        self.trajectory.append(timestamp, self._pose)
        res = FrameResult(self._pose, rel, ok, cost, 1.0 if ok else 0.0, self._index)
        self._index += 1
        return res
