"""Depth/vertex pyramids for coarse-to-fine projective ICP.

The reference controls problem size with voxel downsampling
(rs_replay_app.cpp:246-247); the TPU-native hot path instead keeps frames on
the image grid and builds a pyramid by validity-aware 2x2 pooling. Pure
reshapes/reductions -> fuses into one XLA program with unprojection and
normal estimation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.ops import normals as normals_mod


class PyramidLevel(NamedTuple):
    vertex_map: jnp.ndarray  # (H, W, 3)
    normal_map: jnp.ndarray  # (H, W, 3); zero where invalid
    valid: jnp.ndarray  # (H, W) bool: vertex AND normal valid
    vertex_valid: jnp.ndarray  # (H, W) bool: vertex valid (normals optional)
    packed: jnp.ndarray  # (4, H, W) planar PLANE table: [nx, ny, nz,
    # d = n . vertex]. Point-to-plane ICP only needs the destination's local
    # plane, so the hot-loop gather fetches 4 floats per correspondence
    # (residual r = n . p - d); invalid pixels carry n = 0 so their Jacobian
    # rows vanish and validity is |n|^2 > 0.5, costing nothing. Planar
    # layout keeps the last two dims (H, W) -- the shape the TPU tiles
    # natively and the Pallas builder kernel emits.


def downsample_depth(depth: jnp.ndarray, valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2x2 validity-aware mean pooling of a depth map.

    A coarse pixel is valid if any of its 4 children are; its depth is the
    mean of valid children. Depth edges are handled by the downstream
    distance-compatibility gate in the ICP step rather than a median filter.
    """
    h, w = depth.shape[-2] // 2 * 2, depth.shape[-1] // 2 * 2
    d = depth[..., :h, :w].reshape(*depth.shape[:-2], h // 2, 2, w // 2, 2)
    m = valid[..., :h, :w].reshape(*valid.shape[:-2], h // 2, 2, w // 2, 2)
    cnt = jnp.sum(m, axis=(-3, -1))
    s = jnp.sum(jnp.where(m, d, 0.0), axis=(-3, -1))
    out_valid = cnt > 0
    out = jnp.where(out_valid, s / jnp.maximum(cnt, 1), 0.0)
    return out, out_valid


def level_intrinsics(
    intr: camera.Intrinsics, num_levels: int
) -> tuple[camera.Intrinsics, ...]:
    """Per-level intrinsics, fine to coarse -- THE single source of truth
    (build_pyramid and the sharded fast path both use it; a hand-rebuilt
    copy can silently diverge on odd dimensions)."""
    out = []
    cur = intr
    for _ in range(num_levels):
        out.append(cur)
        cur = cur.halved()
    return tuple(out)


def _use_pallas_kernel(use_kernel: str | bool) -> bool:
    if use_kernel == "auto":
        import jax

        return jax.default_backend() not in ("cpu",)
    return bool(use_kernel)


def depth_to_meters(depth, scale=1.0):
    """Convert a raw depth frame (any leading batch dims) to f32 meters
    ON DEVICE.

    Integer frames (the native RealSense Z16 / TUM 16-bit PNG format)
    upload as uint16 -- HALF the host->device bytes of f32; windowed and
    multi-stream paths pay that upload inside the timed dispatch
    (BENCHMARKS.md "windowed paradox") -- and scale inside the compiled
    program, where XLA fuses the convert into the first pyramid level
    for free. Float frames are already meters; 0 stays 0 (invalid)."""
    if jnp.issubdtype(depth.dtype, jnp.integer):
        return depth.astype(jnp.float32) * jnp.float32(scale)
    return depth.astype(jnp.float32)


def build_pyramid(
    depth: jnp.ndarray,
    intr: camera.Intrinsics,
    num_levels: int = 3,
    min_depth: float = 0.05,
    max_depth: float = 10.0,
    with_normals: bool = True,
    use_kernel: str | bool = "auto",
) -> tuple[list[PyramidLevel], list[camera.Intrinsics]]:
    """Depth image -> list of (vertex, normal, valid, packed) levels, fine to
    coarse.

    with_normals=False builds a SOURCE-role pyramid: projective point-to-
    plane ICP only reads the destination frame's normals, so source frames
    skip normal estimation and table packing entirely (the placeholder
    zeros are dead-code-eliminated by XLA when unused).

    use_kernel: 'auto' runs the fused Pallas level builder
    (kernels/level_kernel.py) on TPU and the XLA composition on CPU; pass
    True/False to force either. Both paths are parity-tested.
    """
    levels: list[PyramidLevel] = []
    intrs: list[camera.Intrinsics] = []
    depth = depth.astype(jnp.float32)  # framework-wide compute dtype
    valid = camera.valid_mask(depth, min_depth, max_depth)
    d = jnp.where(valid, depth, 0.0)
    cur_intr = intr
    pallas_ok = with_normals and _use_pallas_kernel(use_kernel)
    for _ in range(num_levels):
        if pallas_ok:
            from realsensetracker_tpu.kernels.level_kernel import build_level_packed

            packed = build_level_packed(d, cur_intr)
            vmap = camera.unproject_depth(d, cur_intr)
            nmap = jnp.moveaxis(packed[0:3], 0, -1)
            lvl_valid = jnp.sum(packed[0:3] ** 2, axis=0) > 0.5
        elif with_normals:
            vmap = camera.unproject_depth(d, cur_intr)
            nmap, n_ok = normals_mod.grid_normals(vmap, valid)
            lvl_valid = valid & n_ok
            d_plane = jnp.sum(vmap * nmap, axis=-1)  # n . q (0 where invalid)
            packed = jnp.concatenate(
                [jnp.moveaxis(nmap, -1, 0), d_plane[None]], axis=0
            )
        else:
            vmap = camera.unproject_depth(d, cur_intr)
            nmap = jnp.zeros_like(vmap)
            lvl_valid = valid
            packed = jnp.zeros((4,) + vmap.shape[:-1], vmap.dtype)
        levels.append(
            PyramidLevel(
                vertex_map=vmap,
                normal_map=nmap,
                valid=lvl_valid,
                vertex_valid=valid,
                packed=packed,
            )
        )
        intrs.append(cur_intr)
        d, valid = downsample_depth(d, valid)
        cur_intr = cur_intr.halved()  # floor dims, matching downsample_depth
    return levels, intrs
