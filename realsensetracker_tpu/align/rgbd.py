"""Joint geometric + photometric RGB-D registration (direct odometry).

The reference intended this and never finished it: photometric_cost.hpp
references undefined GetColor/project and compiles nowhere, and the color
stream it would have consumed is wired through rs_driver.cpp:33-103. Here
the combined objective is a first-class aligner:

    E(xi) = sum_i w_g(r_g) r_g^2  +  lambda^2 sum_i w_p(r_p) r_p^2
    r_g = n_dst . (T p_i) - d_dst          (point-to-plane, meters)
    r_p = I_dst(project(T p_i)) - i_src    (intensity, [0,1] units)

Both blocks share ONE source sample set (points + attached intensities) and
reduce into the same 6x6 normal equations per Gauss-Newton iteration:
geometry via the plane-table gather (align/projective.py semantics), photo
via autodiff through projection AND bilinear sampling (the jets the
reference hand-rolled in sample.hpp/jet_extras.hpp). lambda converts
intensity units into meters; it is the classic direct-RGBD balance knob.

Coarse-to-fine over the same pyramid schedule as projective ICP; intensity
levels are 2x2 mean pooled. Everything is fixed-shape and jit-traced once.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from realsensetracker_tpu.align import projective
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.ops.pyramid import build_pyramid, downsample_depth
from realsensetracker_tpu.ops.sampling import bilinear_sample


class RgbdIcpConfig(NamedTuple):
    """Static solver configuration (hashable -> jit static arg)."""

    iters: tuple[int, ...] = (6, 5, 4)  # per level, coarse -> fine
    samples: int = 2048
    coarse_sample_divisor: int = 4
    min_samples: int = 256
    dist_threshold: float = 0.25
    gnc_mu: float = 1e-2
    damping: float = 1e-6
    min_depth: float = 0.05
    max_depth: float = 10.0
    photo_weight: float = 0.1  # lambda: meters per intensity unit
    photo_huber: float = 0.08  # Huber delta on intensity residuals


class RgbdResult(NamedTuple):
    transform: jnp.ndarray  # (4, 4)
    rmse: jnp.ndarray  # geometric point-to-plane RMSE at finest level
    photo_rmse: jnp.ndarray  # photometric RMSE at finest level
    inlier_fraction: jnp.ndarray
    num_matched: jnp.ndarray


def downsample_gray(gray: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean pooling of an intensity image."""
    h, w = gray.shape[-2] // 2 * 2, gray.shape[-1] // 2 * 2
    g = gray[..., :h, :w].reshape(*gray.shape[:-2], h // 2, 2, w // 2, 2)
    return jnp.mean(g, axis=(-3, -1))


def sample_depth_gray_points(
    depth: jnp.ndarray,
    gray: jnp.ndarray,
    intr: camera.Intrinsics,
    count: int,
    min_depth: float = 0.05,
    max_depth: float = 10.0,
):
    """Stride-sample (points, intensities, ok) straight from depth+gray maps.

    Same index pattern as projective.sample_depth_points -- the source role
    only ever touches `count` pixels, so no vertex map is materialized.
    """
    h, w = depth.shape
    npix = h * w
    count = min(count, npix)
    stride = npix // count
    idx = jnp.arange(count) * stride
    # Static strided SLICE, not a gather (see projective.sample_depth_points).
    d = depth.reshape(npix)[: count * stride : stride]
    i_src = gray.reshape(npix)[: count * stride : stride]
    ok = jnp.isfinite(d) & (d > min_depth) & (d < max_depth)
    d = jnp.where(ok, d, 0.0)
    u = (idx % w).astype(d.dtype)
    v = (idx // w).astype(d.dtype)
    pts = jnp.stack(
        [d * (u - intr.cx) / intr.fx, d * (v - intr.cy) / intr.fy, d], axis=-1
    )
    return pts, i_src, ok


from realsensetracker_tpu.align.photometric import huber_weight as _huber_w  # noqa: E402
# (single shared Huber IRLS weight -- a drifted copy here would silently
# change the geometric/photometric balance between the two aligners)


def _photo_system(T, src_pts, src_inten, src_ok, dst_gray, intr, cfg):
    """Photometric block: (H (6,6), b (6,), (wsse, wsum)) at transform T."""

    def residual(tw):
        p = se3.transform_points(se3.compose(se3.exp(tw), T), src_pts)
        u, v, z = camera.project(p, intr)
        vals, inb = bilinear_sample(dst_gray, u, v)
        ok = inb & (z > cfg.min_depth)
        return jnp.where(ok, vals - src_inten, 0.0), ok

    zero = jnp.zeros(6, jnp.float32)
    r, ok = residual(zero)
    # (P, 6) Jacobian via forward-mode autodiff through projection AND
    # bilinear interpolation (the reference's unfinished jet machinery,
    # sample.hpp:100-117 / jet_extras.hpp:42-99, done by jax.jacfwd).
    J = jax.jacfwd(lambda tw: residual(tw)[0])(zero)
    w = _huber_w(r, cfg.photo_huber) * (ok & src_ok).astype(r.dtype)
    Jw = J * w[:, None]
    H = jnp.matmul(Jw.T, J, precision=jax.lax.Precision.HIGHEST)
    b = jnp.matmul(Jw.T, r, precision=jax.lax.Precision.HIGHEST)
    return H, b, (jnp.sum(w * r * r), jnp.sum(w))


def _step(T, sample, dst_level, dst_gray, intr, cfg, icp_cfg):
    """One joint GN iteration: both blocks reduce into one 6x6 solve."""
    src_pts, src_inten, src_ok = sample
    Hg, bg, aux_g = projective.build_normal_equations(
        T, src_pts, src_ok, dst_level, intr, icp_cfg
    )
    Hp, bp, aux_p = _photo_system(T, src_pts, src_inten, src_ok, dst_gray, intr, cfg)
    lam2 = cfg.photo_weight * cfg.photo_weight
    H = Hg + lam2 * Hp
    b = bg + lam2 * bp

    damp = cfg.damping * jnp.trace(H) + 1e-12
    delta = -jnp.linalg.solve(H + damp * jnp.eye(6, dtype=H.dtype), b)
    delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
    T_new = se3.compose(se3.exp(delta), T)

    wsse_g, wsum_g, ok_count = aux_g
    wsse_p, wsum_p = aux_p
    stats = (
        jnp.sqrt(wsse_g / (wsum_g + 1e-12)).astype(jnp.float32),
        jnp.sqrt(wsse_p / (wsum_p + 1e-12)).astype(jnp.float32),
        (ok_count / src_pts.shape[0]).astype(jnp.float32),
        ok_count,
    )
    return T_new, stats


@partial(jax.jit, static_argnames=("intrs", "cfg"))
def rgbd_icp_sampled(
    src_samples,  # tuple per level (fine -> coarse) of (pts, inten, ok)
    dst_levels,  # destination plane-table pyramid (fine -> coarse)
    dst_grays,  # destination intensity pyramid (fine -> coarse)
    intrs: tuple[camera.Intrinsics, ...],
    init_transform: jnp.ndarray | None = None,
    cfg: RgbdIcpConfig = RgbdIcpConfig(),
) -> RgbdResult:
    """Coarse-to-fine joint RGB-D alignment with pre-sampled source points."""
    num_levels = len(intrs)
    assert len(cfg.iters) == num_levels, "one iteration count per level"
    T = se3.identity() if init_transform is None else init_transform
    icp_cfg = projective.ProjectiveIcpConfig(
        iters=cfg.iters, samples=cfg.samples,
        coarse_sample_divisor=cfg.coarse_sample_divisor,
        min_samples=cfg.min_samples, dist_threshold=cfg.dist_threshold,
        gnc_mu=cfg.gnc_mu, damping=cfg.damping,
        min_depth=cfg.min_depth, max_depth=cfg.max_depth,
    )

    stats = (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0), jnp.int32(0))
    for li in range(num_levels - 1, -1, -1):  # coarse -> fine
        level_iters = cfg.iters[num_levels - 1 - li]
        sample = src_samples[li]
        dst_level = dst_levels[li]
        dst_gray = dst_grays[li]
        intr = intrs[li]

        def body(_, carry, sample=sample, dst_level=dst_level,
                 dst_gray=dst_gray, intr=intr):
            T, _ = carry
            return _step(T, sample, dst_level, dst_gray, intr, cfg, icp_cfg)

        T, stats = jax.lax.fori_loop(0, level_iters, body, (T, stats))

    # Final statistics AT the returned transform on the finest level: the
    # in-loop stats are measured at the pre-update pose and would lag the
    # returned transform by one GN step (the success gate in
    # tracking/rgbd.py reads inlier_fraction, so the lag is load-bearing).
    _, stats = _step(
        T, src_samples[0], dst_levels[0], dst_grays[0], intrs[0], cfg, icp_cfg
    )
    rmse, photo_rmse, frac, matched = stats
    return RgbdResult(
        transform=T, rmse=rmse, photo_rmse=photo_rmse,
        inlier_fraction=frac, num_matched=matched,
    )


def build_rgbd_target(depth, gray, intr, cfg: RgbdIcpConfig = RgbdIcpConfig()):
    """Destination-side preprocation: (plane-table levels, gray levels, intrs).

    Reusable across frames (keyframe / frame-to-frame trackers keep it)."""
    cfg = projective.fit_levels(cfg, *jnp.shape(depth)[-2:])
    num_levels = len(cfg.iters)
    levels, intrs = build_pyramid(
        depth, intr, num_levels, cfg.min_depth, cfg.max_depth
    )
    grays = []
    g = jnp.asarray(gray, jnp.float32)
    for _ in range(num_levels):
        grays.append(g)
        g = downsample_gray(g)
    return tuple(levels), tuple(grays), tuple(intrs)


def sample_rgbd_source(depth, gray, intrs, cfg: RgbdIcpConfig = RgbdIcpConfig()):
    """Source-side sampling at every level (no vertex/normal maps built)."""
    depth = jnp.asarray(depth, jnp.float32)
    gray = jnp.asarray(gray, jnp.float32)
    valid = camera.valid_mask(depth, cfg.min_depth, cfg.max_depth)
    d = jnp.where(valid, depth, 0.0)
    g = gray
    samples = []
    for li in range(len(intrs)):
        level_samples = max(
            cfg.samples // (cfg.coarse_sample_divisor**li), cfg.min_samples
        )
        samples.append(
            sample_depth_gray_points(
                d, g, intrs[li], level_samples, cfg.min_depth, cfg.max_depth
            )
        )
        d, valid = downsample_depth(d, valid)
        g = downsample_gray(g)
    return tuple(samples)


def register_rgbd_pair(
    src_depth, src_gray, dst_depth, dst_gray,
    intr: camera.Intrinsics,
    cfg: RgbdIcpConfig = RgbdIcpConfig(),
    init_transform: jnp.ndarray | None = None,
) -> RgbdResult:
    """End-to-end RGB-D pair registration: depth+gray in -> SE(3) out."""
    cfg = projective.fit_levels(cfg, *jnp.shape(src_depth)[-2:])
    dst_levels, dst_grays, intrs = build_rgbd_target(dst_depth, dst_gray, intr, cfg)
    src_samples = sample_rgbd_source(src_depth, src_gray, intrs, cfg)
    return rgbd_icp_sampled(
        src_samples, dst_levels, dst_grays, intrs, init_transform, cfg
    )
