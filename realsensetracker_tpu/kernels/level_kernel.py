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
    # Pin scalar constants to f32 (under jax_enable_x64, Python floats would
    # otherwise promote the whole band to f64).
    fx, fy, cx, cy = (jnp.float32(v) for v in (fx, fy, cx, cy))

    # (tile_h + 2, w) working band: previous block's last row, this block,
    # next block's first row.
    band = jnp.concatenate([d_prev[-1:, :], d_cur[:, :], d_next[:1, :]], axis=0)
    valid = band > 0.0

    # tpu.iota only produces integers; cast to f32 afterwards.
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, w), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, w), 1).astype(jnp.float32)
    vv = rows + (i * tile_h - 1).astype(jnp.float32)
    x = band * (cols - cx) * (1.0 / fx)
    y = band * (vv - cy) * (1.0 / fy)
    z = band

    # Horizontal neighbors: lane rolls (wrap masked out via interior below).
    def lroll(a, s):
        # pltpu.roll wants non-negative shifts; roll by s mod W.
        return pltpu.roll(a, shift=s % w, axis=1)

    du_x = lroll(x, -1) - lroll(x, 1)
    du_y = lroll(y, -1) - lroll(y, 1)
    du_z = lroll(z, -1) - lroll(z, 1)
    # Vertical neighbors: shifted row slices of the band.
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
    # Work with the squared norm only: the normalization below uses rsqrt,
    # so the sqrt would be a pure extra transcendental per pixel.
    n2 = nx * nx + ny * ny + nz * nz

    v_c = valid[c, :]
    # Mosaic can't roll i1 vectors: roll the depth and re-compare instead.
    ok = (
        v_c
        & (lroll(z, -1)[c, :] > 0.0)
        & (lroll(z, 1)[c, :] > 0.0)
        & valid[dn, :]
        & valid[up, :]
        & (n2 > 1e-24)
    )
    # Interior mask: first/last image row and column are invalid (also
    # neutralizes wrapped lane rolls and clamped halo blocks).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 0) + i * tile_h
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 1)
    ok = ok & (row_ids > 0) & (row_ids < h - 1) & (col_ids > 0) & (col_ids < w - 1)

    inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    nx, ny, nz = nx * inv, ny * inv, nz * inv
    # Orient toward the camera: flip when n . p > 0 (ops/normals.py).
    xc, yc, zc = x[c, :], y[c, :], z[c, :]
    flip = jnp.where(
        nx * xc + ny * yc + nz * zc > 0, jnp.float32(-1.0), jnp.float32(1.0)
    )
    okf = ok.astype(jnp.float32)
    nx, ny, nz = nx * flip * okf, ny * flip * okf, nz * flip * okf
    d_plane = nx * xc + ny * yc + nz * zc  # n . q; 0 where invalid (n = 0)

    out_ref[:] = jnp.stack([nx, ny, nz, d_plane], axis=0)


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
    # Mosaic requires the second-to-last block dim to be a multiple of 8 or
    # equal to the array dim: pick the LARGEST multiple-of-8 divisor of H
    # up to tile_h, else process the whole image as one block (small
    # pyramid levels).
    if h % tile_h != 0:
        tile_h = next(
            (t for t in range(min(tile_h, h), 7, -1) if h % t == 0 and t % 8 == 0),
            h,
        )
    grid = h // tile_h
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
        out_shape=jax.ShapeDtypeStruct((4, h, w), jnp.float32),
        interpret=interpret,
    )(depth, depth, depth)
