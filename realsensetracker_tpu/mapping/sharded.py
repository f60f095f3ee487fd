"""Multi-chip dense mapping: the TSDF volume sharded over a device mesh.

A dense volume is the one tracker state that outgrows a single chip --
512^3 float32 tsdf+weight is 1 GB, and integration touches every voxel
every frame. Both scale by SHARDING THE GRID, not by replicating it:

* Layout: x-slabs. ``tsdf``/``weight`` (V, V, V) split on axis 0 over a
  mesh axis (``P(axis, None, None)``), V/devices voxel planes per chip.
* ``integrate`` needs NO communication: every voxel's update is
  independent (project center -> gather depth -> running average), and
  the (H, W) depth frame is replicated (a frame is ~1 MB; the volume is
  the big thing). XLA partitions the whole update elementwise along the
  slabs -- per-chip cost drops by the device count.
* ``raycast`` samples the volume at arbitrary ray positions, so under
  SPMD XLA inserts ONE all-gather of the (tsdf, weight) planes per
  render; the march itself then runs replicated. That is the right
  trade at tracking sizes (128^3 = 16 MB over ICI, microseconds)
  and the honest cost of a global gather -- a halo-exchange marcher
  would only pay off far beyond current volume sizes.

Nothing here reimplements the math: these are sharding annotations
around mapping/tsdf.py, following the standard JAX recipe (pick a mesh,
annotate shardings, let XLA insert collectives). Parity with the
unsharded path is exact and tested on the 8-device CPU mesh
(tests/test_sharded_tsdf.py).
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from realsensetracker_tpu.mapping import tsdf as tsdf_mod


def volume_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NamedSharding splitting a (V, V, V) grid into x-slabs on ``axis``."""
    return NamedSharding(mesh, P(axis, None, None))


def shard_volume(
    vol: tsdf_mod.TsdfVolume, mesh: Mesh, axis: str = "data"
) -> tsdf_mod.TsdfVolume:
    """Lay the volume out as x-slabs across ``mesh``'s ``axis``.

    Requires the resolution to be divisible by the axis size. Color
    planes (4-D) shard on the same grid axis.
    """
    n = mesh.shape[axis]
    if vol.resolution % n != 0:
        raise ValueError(
            f"volume resolution {vol.resolution} not divisible by mesh "
            f"axis {axis!r} of size {n}"
        )
    s3 = volume_sharding(mesh, axis)
    s4 = NamedSharding(mesh, P(axis, None, None, None))
    return tsdf_mod.TsdfVolume(
        tsdf=jax.device_put(vol.tsdf, s3),
        weight=jax.device_put(vol.weight, s3),
        color=(
            jax.device_put(vol.color, s4) if vol.color is not None else None
        ),
        color_weight=(
            jax.device_put(vol.color_weight, s3)
            if vol.color_weight is not None else None
        ),
    )


def init_volume_sharded(
    cfg: tsdf_mod.TsdfConfig,
    mesh: Mesh,
    axis: str = "data",
    with_color: bool = False,
) -> tsdf_mod.TsdfVolume:
    """init_volume laid out directly in x-slabs (no replicated staging)."""
    return shard_volume(
        tsdf_mod.init_volume(cfg, with_color=with_color), mesh, axis
    )


@partial(jax.jit, static_argnames=("intr", "cfg"), donate_argnums=(0,))
def _integrate_pinned(vol, depth, pose, intr, cfg, color=None):
    # Same program as tsdf.integrate (the nested jit inlines); a separate
    # entry so the sharded volume is DONATED: elementwise update -> XLA
    # keeps the slab layout and reuses the slab buffers in place.
    return tsdf_mod.integrate(vol, depth, pose, intr, cfg, color=color)


def integrate(vol, depth, pose_world_from_cam, intr, cfg, color=None):
    """Sharded integrate: identical math to tsdf.integrate, with the
    input volume's buffers DONATED so each chip updates its slab in
    place (no second volume-sized allocation per frame).

    TsdfConfig.integrate_slab is forced OFF here: the frustum slab's
    dynamic_slice/dynamic_update_slice spans x-slab boundaries, so under
    GSPMD XLA would materialize cross-chip gathers -- the sharded pass
    is already per-voxel local, and each chip only visits its own slab,
    which is the same (V/n)-fold visit reduction the frustum slab buys
    single-chip."""
    if getattr(cfg, "integrate_slab", 0):
        cfg = cfg._replace(integrate_slab=0)
    return _integrate_pinned(vol, depth, pose_world_from_cam, intr, cfg,
                             color=color)


def raycast(vol, pose_world_from_cam, intr, cfg):
    """Render from a sharded volume. The volume gathers at arbitrary ray
    samples, so XLA all-gathers the slabs once and marches replicated --
    call through to the standard raycast (one program, SPMD handles it).
    """
    return tsdf_mod.raycast(vol, pose_world_from_cam, intr, cfg)
