"""Multi-host utilities: dataset sharding across processes.

SURVEY.md section 5.8: intra-pod scaling rides ICI (parallel/batched.py,
sharded.py); across hosts the only DCN traffic is dataset distribution.
These helpers build globally-sharded frame batches from per-process local
data using jax.make_array_from_process_local_data -- each host loads only
its own shard of streams/pairs, and the global array spans the pod.

Single-process environments (tests, this container) degrade gracefully:
with one process the "global" batch is just the local one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_frame_batch(
    local_frames: np.ndarray,  # (B_local, H, W) this process's frames
    mesh: Mesh,
    data_axis: str = "data",
) -> jax.Array:
    """Assemble a globally-sharded (B_global, H, W) batch from local shards."""
    sharding = NamedSharding(mesh, P(data_axis))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_frames))


def process_stream_slice(num_streams: int) -> slice:
    """Which stream indices this process owns (contiguous block split)."""
    pid = jax.process_index()
    n = jax.process_count()
    per = (num_streams + n - 1) // n
    return slice(pid * per, min((pid + 1) * per, num_streams))


def all_processes_ready() -> None:
    """Cross-host barrier (no-op single-process)."""
    if jax.process_count() > 1:
        # A tiny psum over all devices acts as a barrier.
        x = jnp.ones(())
        jax.jit(lambda v: jax.lax.psum(v, "i"), out_shardings=None)
        # Simplest portable barrier: block on a global reduction.
        y = jax.device_get(jax.jit(lambda v: v.sum())(x))
        del y
