"""Coarse-to-fine pairwise cloud alignment: the rs_align_app pipeline.

Port of the rs_align_app main flow (rs_align_app.cpp:243-314): voxel
downsample both clouds, FPFH features, 2-NN feature matches, Lowe
ratio pruning with Gaussian weights, weighted Kabsch seed, GNC-ICP refine,
optional robust global registration -- all as one composable function over
fixed-capacity masked clouds.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from realsensetracker_tpu.align import icp as icp_mod
from realsensetracker_tpu.align import kabsch as kabsch_mod
from realsensetracker_tpu.align import robust_global
from realsensetracker_tpu.api.config import AlignConfig
from realsensetracker_tpu.geometry import se3
from realsensetracker_tpu.ops import cloud as cloud_mod
from realsensetracker_tpu.ops import fpfh as fpfh_mod
from realsensetracker_tpu.ops import voxel as voxel_mod


class AlignPairResult(NamedTuple):
    transform: jnp.ndarray
    num_matches: jnp.ndarray
    icp_mean_cost: jnp.ndarray
    success: bool
    # Intermediates, exposed so render/inspection paths do not recompute
    # the downsample + O(N^2) FPFH pipeline a second time:
    src_down: object = None   # voxel-downsampled source Cloud
    src_feats: object = None  # its FPFH features (None without FPFH/robust)


def align_pair(
    src: cloud_mod.Cloud,
    dst: cloud_mod.Cloud,
    cfg: AlignConfig = AlignConfig(),
    viewpoint: jnp.ndarray | None = None,
) -> AlignPairResult:
    """Register src onto dst following the rs_align_app recipe."""
    if viewpoint is None:
        viewpoint = jnp.zeros(3, jnp.float32)  # rs_align_app.cpp:275-278

    src_d = voxel_mod.downsample_voxel(src, cfg.voxel_size)
    dst_d = voxel_mod.downsample_voxel(dst, cfg.voxel_size)
    # Honor cfg.cloud_capacity ("fixed capacity after voxel downsample"):
    # without this bound the FPFH kNN / ICP NN passes run O(N^2) over the
    # full input capacity no matter what the config says.
    cap = cfg.cloud_capacity
    if cap and src_d.capacity > cap:
        src_d = cloud_mod.subsample_to_capacity(src_d, cap)
    if cap and dst_d.capacity > cap:
        dst_d = cloud_mod.subsample_to_capacity(dst_d, cap)

    xfm = se3.identity()
    n_matches = jnp.int32(0)
    src_f = dst_f = None
    if cfg.init_with_fpfh or cfg.use_robust:
        max_nbrs = cfg.fpfh_max_neighbors
        if max_nbrs == 0:  # auto: size the kNN cap to the densest true ball
            max_nbrs = fpfh_mod.auto_max_neighbors(
                (src_d, cfg.feature_radius), (dst_d, cfg.feature_radius)
            )
        src_f, trunc_s = fpfh_mod.compute_fpfh_checked(
            src_d, viewpoint, cfg.normal_k, cfg.feature_radius, max_nbrs
        )
        dst_f, trunc_d = fpfh_mod.compute_fpfh_checked(
            dst_d, viewpoint, cfg.normal_k, cfg.feature_radius, max_nbrs
        )
        # Truncation detection is a free byproduct of the kNN pass (the
        # K+1-th neighbor), not an extra O(N^2) sweep.
        if bool(trunc_s) or bool(trunc_d):
            import warnings

            warnings.warn(
                "FPFH neighborhood cap truncates the radius ball "
                f"(fpfh_max_neighbors={max_nbrs} < densest ball); features "
                "will drift from radiusSearch semantics (fpfh.cpp:133-147). "
                "Set fpfh_max_neighbors=0 for auto sizing.",
                stacklevel=2,
            )

    if cfg.init_with_fpfh:
        matches, _ = fpfh_mod.compute_matches(src_f, dst_f, src_d.mask, dst_d.mask, 2)
        j_best, weights, keep = fpfh_mod.prune_matches_lowe(
            matches, src_f, dst_f, cfg.lowe_ratio, src_d.mask
        )
        n_matches = jnp.sum(keep)
        xfm = kabsch_mod.solve_kabsch(
            src_d.points, dst_d.points[j_best], weights=weights, mask=keep
        )

    icp_cost = jnp.float32(0.0)
    if cfg.refine_with_icp:
        res = icp_mod.align_icp(src_d, dst_d, cfg.icp_max_iter, init_transform=xfm)
        xfm = res.transform
        icp_cost = res.mean_cost

    if cfg.use_robust:
        rr = robust_global.register_robust(
            src_d, dst_d, src_f, dst_f, cfg.noise_bound
        )
        xfm = jnp.where(rr.valid, rr.transform, xfm)

    return AlignPairResult(
        transform=xfm,
        num_matches=n_matches,
        icp_mean_cost=icp_cost,
        success=bool(jnp.all(jnp.isfinite(xfm))),
        src_down=src_d,
        src_feats=src_f,
    )
