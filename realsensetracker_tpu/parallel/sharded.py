"""Point-sharded registration: shard_map + psum over the 6x6 normal equations.

The "tensor parallel" axis of this workload (SURVEY.md section 2, parallelism
inventory): sample points of one registration are split across chips, each
chip builds a partial H (6x6) / b (6) from its slice, and a jax.lax.psum over
the ICI ring reduces them before the (tiny, replicated) solve. Combined with
the data axis this scales a single large registration AND a batch of them
across a pod slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from realsensetracker_tpu.align import projective
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.ops.pyramid import build_pyramid


def register_batch_point_sharded(
    mesh: Mesh,
    src_depths: jnp.ndarray,  # (B, H, W)
    dst_depths: jnp.ndarray,  # (B, H, W)
    intr: camera.Intrinsics,
    cfg: projective.ProjectiveIcpConfig = projective.ProjectiveIcpConfig(),
    data_axis: str = "data",
    point_axis: str = "point",
):
    """Register a batch with pairs sharded over `data_axis` and each pair's
    GN reduction sharded over `point_axis` (psum of H, b per iteration).

    Returns (transforms (B, 4, 4), rmse (B,)).
    """
    point_size = mesh.shape[point_axis]
    if cfg.samples % point_size != 0:
        raise ValueError("cfg.samples must be divisible by the point-axis size")
    num_levels = len(cfg.iters)

    def one_pair(src_depth, dst_depth):
        # XLA pyramid path: the Pallas level kernel does not yet carry vma
        # metadata through shard_map's collective-safety checking.
        src_levels, intrs = build_pyramid(
            src_depth, intr, num_levels, cfg.min_depth, cfg.max_depth,
            with_normals=False, use_kernel=False,
        )
        dst_levels, _ = build_pyramid(
            dst_depth, intr, num_levels, cfg.min_depth, cfg.max_depth, use_kernel=False
        )
        pidx = jax.lax.axis_index(point_axis)

        # Mark the carry as varying over the data axis so the fori_loop carry
        # type matches the (data-varying) update from the sharded inputs.
        T = jax.lax.pcast(se3.identity(), (data_axis,), to="varying")
        rmse = jax.lax.pcast(jnp.float32(0.0), (data_axis,), to="varying")
        for li in range(num_levels - 1, -1, -1):  # coarse -> fine
            level_iters = cfg.iters[num_levels - 1 - li]
            level_samples = max(
                cfg.samples // (cfg.coarse_sample_divisor**li), cfg.min_samples
            )
            pts, _, ok = projective.sample_level(src_levels[li], level_samples)
            # Effective per-level sample count (coarse levels may have fewer
            # pixels than cfg.samples); each point-axis member takes its
            # contiguous slice. A remainder tail (< point_size points) is
            # dropped -- negligible and keeps shapes static.
            local_samples = max(pts.shape[0] // point_size, 1)
            start = pidx * local_samples
            local_pts = jax.lax.dynamic_slice_in_dim(pts, start, local_samples)
            local_ok = jax.lax.dynamic_slice_in_dim(ok, start, local_samples)
            dst_level = dst_levels[li]
            lvl_intr = intrs[li]

            def body(_, carry, dst_level=dst_level, lvl_intr=lvl_intr, local_pts=local_pts, local_ok=local_ok):
                T, _rmse = carry
                H, b, aux = projective.build_normal_equations(
                    T, local_pts, local_ok, dst_level, lvl_intr, cfg
                )
                # The collective: reduce partial normal equations over ICI.
                H, b, aux = jax.lax.psum((H, b, aux), axis_name=point_axis)
                T_new, stats = projective.solve_update(T, H, b, aux, cfg.samples, cfg)
                return T_new, stats[0]

            T, rmse = jax.lax.fori_loop(0, level_iters, body, (T, rmse))
        return T, rmse

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis)),
    )
    def run(src_local, dst_local):
        return jax.vmap(one_pair)(src_local, dst_local)

    return jax.jit(run)(src_depths, dst_depths)
