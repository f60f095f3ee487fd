"""Pallas kernel: fused pyramid-level builder (depth -> plane table).

One pass over a depth image produces the planar PLANE table
[nx | ny | nz | d = n . vertex] that projective ICP gathers from
(align/projective.py): the point-to-plane residual is r = n . p - d, so
the destination frame reduces to 4 floats per pixel. The XLA reference
implementation (ops/pyramid.build_pyramid) expresses the same math as ~20
separate roll/elementwise/concat ops; this kernel reads each depth row once
from VMEM and writes the 4 output planes once -- the destination-frame
preprocessing at memory-bound speed.

Grid: one program per TILE_H-row band. Vertical neighbors come from
passing the depth array three times with shifted block index maps (the
standard Pallas halo trick); horizontal neighbors are lane rolls. Border
pixels are invalidated by the interior mask, which also covers the clamped
halo blocks of the first/last band.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realsensetracker_tpu.geometry import camera


def _level_kernel(d_prev, d_cur, d_next, out_ref, *, tile_h, h, w, fx, fy, cx, cy):
    i = pl.program_id(0)
    # (tile_h + 2, w) working band: previous block's last row, this block,
    # next block's first row.
    band = jnp.concatenate([d_prev[-1:, :], d_cur[:, :], d_next[:1, :]], axis=0)
    out_ref[:] = _level_math(
        band, i, tile_h=tile_h, h=h, w=w, fx=fx, fy=fy, cx=cx, cy=cy
    )


@functools.partial(jax.jit, static_argnames=("intr", "tile_h", "interpret"))
def build_level_packed(
    depth: jnp.ndarray,
    intr: camera.Intrinsics,
    tile_h: int = 240,  # the kernel is launch/DMA bound, not compute bound
    # (a copy-only variant costs ~90% as much): fewer, fatter programs win.
    # 240 measured 16% faster than 48 at 480x640 batch 512; 480 (whole
    # image) overflows the 16 MB VMEM scoped allocation by ~0.4 MB.
    interpret: bool = False,
) -> jnp.ndarray:
    """Depth (H, W) with 0=invalid -> planar plane table (4, H, W).

    Output matches ops.pyramid.build_pyramid's `packed` field bit-for-bit up
    to normalization rounding (parity-tested in tests/test_kernels.py).
    """
    depth = depth.astype(jnp.float32)
    h, w = depth.shape
    tile_h, padded_h = _tile_plan(h, tile_h)
    if padded_h != h:
        # Zero rows are invalid depth: the kernel's validity/interior masks
        # (which use the TRUE h) zero their plane-table rows, so padding is
        # inert and sliced off below.
        depth = jnp.concatenate(
            [depth, jnp.zeros((padded_h - h, w), depth.dtype)], axis=0
        )
    grid = padded_h // tile_h
    kernel = functools.partial(
        _level_kernel,
        tile_h=tile_h,
        h=h,
        w=w,
        fx=intr.fx,
        fy=intr.fy,
        cx=intr.cx,
        cy=intr.cy,
    )
    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (tile_h, w),
        lambda i, off=off: (jnp.clip(i + off, 0, grid - 1), 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[spec(-1), spec(0), spec(1)],
        out_specs=pl.BlockSpec(
            (4, tile_h, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, padded_h, w), jnp.float32),
        interpret=interpret,
    )(depth, depth, depth)[:, :h, :]


# ---------------------------------------------------------------------------
# Batched-grid variants (VERDICT r2 #3 probe): the production path batches by
# vmap-lifting the per-image pallas_call above; these express the batch as an
# EXPLICIT grid dimension instead, plus a 2-pass variant that replaces the
# three shifted passes over the depth array (the halo trick reads every
# depth byte three times) with one pass + a precomputed (B, bands, 2, W)
# boundary-row sideband -- cutting kernel HBM reads from 3x to ~1x of the
# depth bytes for a kernel whose own profile says it is DMA-bound.
# ---------------------------------------------------------------------------


def _level_kernel_batched(d_prev, d_cur, d_next, out_ref, *, tile_h, h, w,
                          fx, fy, cx, cy):
    """Same math as _level_kernel; refs carry a leading (1,) batch block."""
    i = pl.program_id(1)
    _level_body(
        jnp.concatenate(
            [d_prev[0, -1:, :], d_cur[0], d_next[0, :1, :]], axis=0
        ),
        i, out_ref, tile_h=tile_h, h=h, w=w, fx=fx, fy=fy, cx=cx, cy=cy,
    )


def _level_kernel_rows(d_cur, bounds, out_ref, *, tile_h, h, w,
                       fx, fy, cx, cy):
    """One full pass + boundary-row sideband: bounds[0] = row above the
    band (clamped), bounds[1] = row below."""
    i = pl.program_id(1)
    _level_body(
        jnp.concatenate(
            [bounds[0, 0, :1, :], d_cur[0], bounds[0, 0, 1:, :]], axis=0
        ),
        i, out_ref, tile_h=tile_h, h=h, w=w, fx=fx, fy=fy, cx=cx, cy=cy,
    )


def _level_body(band, i, out_ref, *, tile_h, h, w, fx, fy, cx, cy):
    """Batched-block wrapper: write the shared math into a (1, 4, tile, W)
    output block."""
    out_ref[0] = _level_math(
        band, i, tile_h=tile_h, h=h, w=w, fx=fx, fy=fy, cx=cx, cy=cy
    )


def _level_math(band, i, *, tile_h, h, w, fx, fy, cx, cy):
    """THE kernel math, shared by every variant: (tile_h + 2, W) depth band
    -> (4, tile_h, W) plane-table block. Keeping one body means a fix to
    the normal/validity math can never apply to one variant and silently
    miss another (all variants are parity-tested against the XLA
    composition in tests/test_kernels.py)."""
    # Pin scalar constants to f32 (under jax_enable_x64, Python floats would
    # otherwise promote the whole band to f64).
    fx, fy, cx, cy = (jnp.float32(v) for v in (fx, fy, cx, cy))
    valid = band > 0.0

    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, w), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, w), 1).astype(jnp.float32)
    vv = rows + (i * tile_h - 1).astype(jnp.float32)
    x = band * (cols - cx) * (1.0 / fx)
    y = band * (vv - cy) * (1.0 / fy)
    z = band

    def lroll(a, s):
        return pltpu.roll(a, shift=s % w, axis=1)

    du_x = lroll(x, -1) - lroll(x, 1)
    du_y = lroll(y, -1) - lroll(y, 1)
    du_z = lroll(z, -1) - lroll(z, 1)
    c = slice(1, tile_h + 1)
    up = slice(0, tile_h)
    dn = slice(2, tile_h + 2)
    dv_x = x[dn, :] - x[up, :]
    dv_y = y[dn, :] - y[up, :]
    dv_z = z[dn, :] - z[up, :]
    duc_x, duc_y, duc_z = du_x[c, :], du_y[c, :], du_z[c, :]

    nx = duc_y * dv_z - duc_z * dv_y
    ny = duc_z * dv_x - duc_x * dv_z
    nz = duc_x * dv_y - duc_y * dv_x
    n2 = nx * nx + ny * ny + nz * nz

    v_c = valid[c, :]
    ok = (
        v_c
        & (lroll(z, -1)[c, :] > 0.0)
        & (lroll(z, 1)[c, :] > 0.0)
        & valid[dn, :]
        & valid[up, :]
        & (n2 > 1e-24)
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 0) + i * tile_h
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 1)
    ok = ok & (row_ids > 0) & (row_ids < h - 1) & (col_ids > 0) & (col_ids < w - 1)

    inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    nx, ny, nz = nx * inv, ny * inv, nz * inv
    xc, yc, zc = x[c, :], y[c, :], z[c, :]
    flip = jnp.where(
        nx * xc + ny * yc + nz * zc > 0, jnp.float32(-1.0), jnp.float32(1.0)
    )
    okf = ok.astype(jnp.float32)
    nx, ny, nz = nx * flip * okf, ny * flip * okf, nz * flip * okf
    d_plane = nx * xc + ny * yc + nz * zc  # n . q; 0 where invalid (n = 0)

    return jnp.stack([nx, ny, nz, d_plane], axis=0)


def _tile_plan(h: int, tile_h: int) -> tuple[int, int]:
    """(tile, padded_h) for the production kernel.

    Mosaic requires the second-to-last block dim to be a multiple of 8 or
    equal to the array dim. Prefer the largest multiple-of-8 divisor of H
    up to tile_h (no padding); small images run as one whole-image block.
    Heights with NO such divisor (482 = 2*241, 500 = 4*125, ...) used to
    fall back to a whole-image block too, which overflows the 16 MB VMEM
    scoped allocation around h ~ 480 -- instead pad H up to the closest
    multiple of some multiple-of-8 tile (inert rows, sliced off by the
    caller)."""
    if h % tile_h == 0:
        return tile_h, h
    t = next(
        (t for t in range(min(tile_h, h), 7, -1) if h % t == 0 and t % 8 == 0),
        None,
    )
    if t is not None:
        return t, h
    if h <= max(tile_h, 240):
        return h, h  # whole-image block, known VMEM-safe at this size
    best_t, best_pad = 8, (-h) % 8
    for t in range(16, min(tile_h, 240) + 1, 8):
        pad = (-h) % t
        if pad <= best_pad:
            best_t, best_pad = t, pad
    return best_t, h + best_pad


def _resolve_tile(h: int, tile_h: int) -> int:
    """Probe variants only (build_level_packed_batched/_rows): exact-divisor
    tile or whole-image fallback -- they do not pad, so arbitrary odd
    heights must go through build_level_packed instead."""
    if h % tile_h != 0:
        tile_h = next(
            (t for t in range(min(tile_h, h), 7, -1) if h % t == 0 and t % 8 == 0),
            h,
        )
    return tile_h


@functools.partial(jax.jit, static_argnames=("intr", "tile_h", "interpret"))
def build_level_packed_batched(
    depths: jnp.ndarray,  # (B, H, W)
    intr: camera.Intrinsics,
    tile_h: int = 240,
    interpret: bool = False,
) -> jnp.ndarray:
    """Explicit grid=(B, bands) batch variant of build_level_packed."""
    depths = depths.astype(jnp.float32)
    b, h, w = depths.shape
    tile_h = _resolve_tile(h, tile_h)
    grid_h = h // tile_h
    kernel = functools.partial(
        _level_kernel_batched, tile_h=tile_h, h=h, w=w,
        fx=intr.fx, fy=intr.fy, cx=intr.cx, cy=intr.cy,
    )
    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, tile_h, w),
        lambda bi, i, off=off: (bi, jnp.clip(i + off, 0, grid_h - 1), 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, grid_h),
        in_specs=[spec(-1), spec(0), spec(1)],
        out_specs=pl.BlockSpec(
            (1, 4, tile_h, w), lambda bi, i: (bi, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 4, h, w), jnp.float32),
        interpret=interpret,
    )(depths, depths, depths)


@functools.partial(jax.jit, static_argnames=("intr", "tile_h", "interpret"))
def build_level_packed_rows(
    depths: jnp.ndarray,  # (B, H, W)
    intr: camera.Intrinsics,
    tile_h: int = 240,
    interpret: bool = False,
) -> jnp.ndarray:
    """2-pass batch variant: one streaming pass over the depth plus a tiny
    XLA-precomputed boundary-row sideband, instead of three shifted passes."""
    depths = depths.astype(jnp.float32)
    b, h, w = depths.shape
    tile_h = _resolve_tile(h, tile_h)
    grid_h = h // tile_h
    band_starts = jnp.arange(grid_h) * tile_h
    above = jnp.clip(band_starts - 1, 0, h - 1)
    below = jnp.clip(band_starts + tile_h, 0, h - 1)
    # (B, bands, 2, W): row above each band, row below each band.
    bounds = jnp.stack([depths[:, above, :], depths[:, below, :]], axis=2)
    kernel = functools.partial(
        _level_kernel_rows, tile_h=tile_h, h=h, w=w,
        fx=intr.fx, fy=intr.fy, cx=intr.cx, cy=intr.cy,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, grid_h),
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, w), lambda bi, i: (bi, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 2, w), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, tile_h, w), lambda bi, i: (bi, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 4, h, w), jnp.float32),
        interpret=interpret,
    )(depths, bounds)
