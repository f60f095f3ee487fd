"""Batched frame-pair registration: vmap on one chip, pjit across a mesh.

BASELINE config 4 ("64 frame pairs per step via vmap") and the data-parallel
half of config 5. Registrations are independent, so the only cross-device
communication is the optional throughput psum -- shardings ride ICI with
zero hot-loop collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from realsensetracker_tpu.align import projective
from realsensetracker_tpu.geometry import camera


@partial(jax.jit, static_argnames=("intr", "cfg"))
def register_batch(
    src_depths: jnp.ndarray,  # (B, H, W)
    dst_depths: jnp.ndarray,  # (B, H, W)
    intr: camera.Intrinsics,
    cfg: projective.ProjectiveIcpConfig = projective.ProjectiveIcpConfig(),
) -> projective.ProjectiveIcpResult:
    """Register B independent frame pairs in one compiled step (vmap)."""
    fn = jax.vmap(lambda s, d: projective.register_depth_pair(s, d, intr, cfg))
    return fn(src_depths, dst_depths)


def register_batch_sharded(
    mesh: Mesh,
    src_depths: jnp.ndarray,
    dst_depths: jnp.ndarray,
    intr: camera.Intrinsics,
    cfg: projective.ProjectiveIcpConfig = projective.ProjectiveIcpConfig(),
    data_axis: str = "data",
) -> projective.ProjectiveIcpResult:
    """Data-parallel batched registration across the mesh's data axis.

    Inputs are sharded over the batch dimension; XLA partitions the whole
    pipeline (pyramids + GN iterations) with no communication between pairs.
    """
    batch_sharding = NamedSharding(mesh, P(data_axis))

    fn = jax.jit(
        lambda s, d: register_batch(s, d, intr, cfg),
        in_shardings=(batch_sharding, batch_sharding),
        out_shardings=projective.ProjectiveIcpResult(
            transform=batch_sharding,
            rmse=batch_sharding,
            inlier_fraction=batch_sharding,
            num_matched=batch_sharding,
        ),
    )
    src = jax.device_put(src_depths, batch_sharding)
    dst = jax.device_put(dst_depths, batch_sharding)
    return fn(src, dst)
