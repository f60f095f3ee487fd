"""Configuration dataclasses: one tree per pipeline stage.

Defaults reproduce the reference's settings structs and hard-coded
constants so parity configurations are reachable out of the box:

* AlignConfig mirrors RsAlignAppSettings (rs_align_app.cpp:21-31):
  voxel_size 0.05, normal_k 16, feature_radius 0.5, lowe_ratio 0.9, and the
  init_with_fpfh / refine_with_icp / use_robust switches;
* icp_max_iter 128 (rs_replay_app.cpp:251, rs_align_app.cpp:303);
* GICP budgets 16 outer (align_gicp.cpp:107) with Huber delta 0.5 (:67);
* covariance k 32 (point_cloud_utils.cpp:104);
* robust noise_bound 0.25 (rs_replay_app.cpp:263, rs_align_app.cpp:312).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from realsensetracker_tpu.align.projective import ProjectiveIcpConfig
from realsensetracker_tpu.align.rgbd import RgbdIcpConfig
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.mapping.tsdf import TsdfConfig


@dataclass
class AlignConfig:
    """Pairwise registration settings (ref RsAlignAppSettings)."""

    voxel_size: float = 0.05
    normal_k: int = 16
    feature_radius: float = 0.5
    lowe_ratio: float = 0.9
    init_with_fpfh: bool = True
    refine_with_icp: bool = True
    use_robust: bool = False  # 'use_teaser' in the reference
    icp_max_iter: int = 128
    fpfh_max_neighbors: int = 64  # kNN cap on the radius ball; 0 = auto-size
    # to the densest true ball (exact radiusSearch parity, fpfh.cpp:133-147)
    noise_bound: float = 0.25
    cloud_capacity: int = 8192  # fixed capacity after voxel downsample


@dataclass
class GicpConfig:
    max_outer: int = 16  # align_gicp.cpp:107
    inner_iters: int = 8
    cov_k: int = 32  # point_cloud_utils.cpp:104
    use_gicp_cov: bool = False  # align_gicp.cpp:121-123 passes false
    huber_delta: float = 0.5  # align_gicp.cpp:67


@dataclass
class TrackerConfig:
    """Streaming tracker settings (ref RsViewerSettings + replay loop)."""

    intrinsics: camera.Intrinsics = camera.TUM_DEFAULT
    method: str = "projective"  # projective | rgbd | keyframe | model |
    # tsdf | icp | gicp
    projective: ProjectiveIcpConfig = ProjectiveIcpConfig()
    rgbd: RgbdIcpConfig = RgbdIcpConfig()
    tsdf: TsdfConfig = TsdfConfig()  # method="tsdf" volume/raycast settings
    tsdf_color: bool = False  # method="tsdf": fuse per-voxel RGB too
    tsdf_photometric: bool = False  # method="tsdf": joint geometric +
    # photometric frame-to-model registration (photometric KinectFusion,
    # uses the `rgbd` solver config); requires tsdf_color -- pins the
    # in-plane motion depth-only point-to-plane cannot observe
    tsdf_submap_radius: float = 0.0  # method="tsdf": > 0 switches to the
    # submap atlas (mapping/submaps.py) -- unbounded dense mapping from
    # fixed-shape volumes, spawning a new one every this-many meters of
    # camera/view-center drift; 0 = single volume
    tsdf_track_scale_fallback: float = 0.0  # method="tsdf" with
    # tsdf.track_scale > 1: constraint-coverage floor below which
    # reduced-resolution tracking auto-falls-back to full resolution
    # (TsdfTracker.track_scale_fallback); 0 = off
    align: AlignConfig = field(default_factory=AlignConfig)
    gicp: GicpConfig = field(default_factory=GicpConfig)
    min_inlier_fraction: float = 0.2
    map_capacity: int = 0
    map_voxel_size: float = 0.05  # rs_replay_app.cpp:178
    depth_scale: float = 1e-3  # meters per raw unit for INTEGER depth
    # frames (RealSense Z16 default 1 mm; TUM 16-bit PNGs use 1/5000).
    # Integer frames are accepted by every method; method="keyframe"
    # uploads them raw (half the f32 bytes) and converts on device.


@dataclass
class ReplayConfig:
    """Replay app settings (ref RsReplayAppSettings, rs_replay_app.cpp:36-39)."""

    record_file: str = ""
    frame_interval_ms: float = 0.0
    max_frames: int = 0  # 0 = all
    trajectory_out: str = ""
