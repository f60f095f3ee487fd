"""Named pipeline registry: string -> configured registration callable.

Each pipeline takes (src, dst) in its natural input type and returns an
object with a .transform (4, 4). Depth-based pipelines take depth images;
cloud-based ones take masked Clouds.
"""

from __future__ import annotations

from typing import Callable

from realsensetracker_tpu.api.config import AlignConfig, GicpConfig
from realsensetracker_tpu.align.projective import ProjectiveIcpConfig
from realsensetracker_tpu.geometry import camera

_REGISTRY: dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def list_pipelines() -> list[str]:
    return sorted(_REGISTRY)


def get_pipeline(name: str, **kwargs) -> Callable:
    """Build pipeline `name` with keyword overrides; returns fn(src, dst)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown pipeline {name!r}; have {list_pipelines()}")
    return _REGISTRY[name](**kwargs)


@register("projective-icp")
def _projective(intr: camera.Intrinsics = camera.TUM_DEFAULT,
                cfg: ProjectiveIcpConfig = ProjectiveIcpConfig()):
    from realsensetracker_tpu.align import projective

    def run(src_depth, dst_depth):
        return projective.register_depth_pair(src_depth, dst_depth, intr, cfg)

    return run


@register("gnc-icp")
def _gnc_icp(max_iter: int = 128):
    from realsensetracker_tpu.align import icp as icp_mod

    def run(src, dst):
        return icp_mod.align_icp(src, dst, max_iter)

    return run


@register("gicp")
def _gicp(cfg: GicpConfig = GicpConfig()):
    from realsensetracker_tpu.align import gicp as gicp_mod

    def run(src, dst):
        return gicp_mod.align_gicp(
            src, dst, max_outer=cfg.max_outer, inner_iters=cfg.inner_iters,
            cov_k=cfg.cov_k, use_gicp_cov=cfg.use_gicp_cov,
            huber_delta=cfg.huber_delta,
        )

    return run


@register("fpfh-kabsch-icp")
def _fpfh(cfg: AlignConfig = AlignConfig()):
    from realsensetracker_tpu.models.pairwise import align_pair

    def run(src, dst):
        return align_pair(src, dst, cfg)

    return run


@register("robust-global")
def _robust(cfg: AlignConfig | None = None):
    from realsensetracker_tpu.models.pairwise import align_pair

    cfg = cfg or AlignConfig(init_with_fpfh=False, refine_with_icp=False, use_robust=True)

    def run(src, dst):
        return align_pair(src, dst, cfg)

    return run


@register("keyframe")
def _keyframe(intr: camera.Intrinsics = camera.TUM_DEFAULT,
              cfg: ProjectiveIcpConfig = ProjectiveIcpConfig()):
    """Pairwise adapter over the keyframe tracker's registration: honors
    the registry contract (run(src_depth, dst_depth) -> .transform) by
    registering the src DEPTH IMAGE onto dst with the same coarse-to-fine
    projective pipeline the tracker uses per frame."""
    from realsensetracker_tpu.align import projective
    from realsensetracker_tpu.ops.pyramid import build_pyramid

    def run(src_depth, dst_depth):
        fit = projective.fit_levels(cfg, int(intr.height), int(intr.width))
        dst_levels, intrs = build_pyramid(dst_depth, intr, len(fit.iters))
        src_levels, _ = build_pyramid(
            src_depth, intr, len(fit.iters), with_normals=False
        )
        return projective.projective_icp(
            tuple(src_levels), tuple(dst_levels), tuple(intrs), cfg=fit
        )

    return run
