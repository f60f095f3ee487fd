"""Pose-graph optimization: nonlinear least squares over SE(3) trajectories.

The reference's structure.txt:1-9 lists an `optimize` module ("nonlinear
optimization on graph?") that was never implemented. This is its TPU-native
realization: given node poses and relative-pose edge measurements (odometry
+ loop closures), minimize

    sum_e || w_e * log( T_meas_e^-1 * T_i^-1 * T_j ) ||^2

by Gauss-Newton with the normal equations solved MATRIX-FREE via conjugate
gradients: Hx products come from jax.jvp/vjp through the residual function,
so no sparse matrix structure is ever materialized -- every CG iteration is
a couple of batched edge evaluations, which is exactly what the TPU wants.
Node 0 is gauge-fixed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from realsensetracker_tpu.geometry import se3


class PoseGraph(NamedTuple):
    poses: jnp.ndarray  # (N, 4, 4) world_from_node estimates
    edges_i: jnp.ndarray  # (E,) int32 source node
    edges_j: jnp.ndarray  # (E,) int32 target node
    measurements: jnp.ndarray  # (E, 4, 4) measured T_i^-1 T_j
    weights: jnp.ndarray  # (E,) scalar edge weights


def from_trajectory(poses, loop_edges=()):
    """Build a graph with consecutive odometry edges + optional loop edges.

    loop_edges: iterable of (i, j, T_ij (4,4), weight).
    """
    poses = jnp.asarray(poses, jnp.float32)
    n = poses.shape[0]
    ei = list(range(n - 1))
    ej = list(range(1, n))
    meas = [se3.compose(se3.inverse(poses[i]), poses[i + 1]) for i in range(n - 1)]
    w = [1.0] * (n - 1)
    for (i, j, T_ij, weight) in loop_edges:
        ei.append(i)
        ej.append(j)
        meas.append(jnp.asarray(T_ij, jnp.float32))
        w.append(float(weight))
    return PoseGraph(
        poses=poses,
        edges_i=jnp.asarray(ei, jnp.int32),
        edges_j=jnp.asarray(ej, jnp.int32),
        measurements=jnp.stack(meas),
        weights=jnp.asarray(w, jnp.float32),
    )


def _edge_residuals(twists, graph: PoseGraph):
    """Stacked weighted residuals (E, 6) at correction `twists` (N, 6).

    Node poses are T_n = exp(twist_n) @ pose_n; node 0's twist is zeroed
    (gauge fix).
    """
    twists = twists.at[0].set(0.0)
    T = se3.compose(se3.exp(twists), graph.poses)  # (N, 4, 4)
    Ti = T[graph.edges_i]
    Tj = T[graph.edges_j]
    pred = se3.compose(se3.inverse(Ti), Tj)
    err = se3.compose(se3.inverse(graph.measurements), pred)
    return se3.log(err) * graph.weights[:, None]


def _cg(matvec, b, iters: int, eps: float = 1e-12):
    """Plain conjugate gradients for SPD systems, fixed iteration count."""

    def body(_, state):
        x, r, p, rs = state
        Ap = matvec(p)
        alpha = rs / jnp.maximum(jnp.vdot(p, Ap), eps)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        beta = rs_new / jnp.maximum(rs, eps)
        p = r + beta * p
        return x, r, p, rs_new

    x0 = jnp.zeros_like(b)
    state = (x0, b, b, jnp.vdot(b, b))
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


@partial(jax.jit, static_argnames=("gn_iters", "cg_iters", "huber_delta"))
def optimize_pose_graph(
    graph: PoseGraph,
    gn_iters: int = 10,
    cg_iters: int = 50,
    damping: float = 1e-6,
    huber_delta: float = 0.1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Optimize node poses; returns (poses (N, 4, 4), final cost).

    Each GN iteration linearizes all edges at once and solves the damped
    normal equations with matrix-free CG (Hv = J^T(J v) via jvp+vjp).

    huber_delta: robust kernel scale on each edge's twist-norm residual
    (IRLS, re-evaluated per GN iteration). Staged GNC-style schedule: the
    first half of the iterations uses the CONVEX Huber weight (pulls
    large-but-true loop residuals in without rejecting them), the second
    half switches to the REDESCENDING Geman-McClure weight (the
    reference's own GNC form, align_icp.cpp:116-118), which drives a
    persistently-inconsistent edge's weight to ~0 instead of merely
    capping its influence -- Huber alone still lets one grossly-wrong
    loop edge bias every pose. 0 disables.
    """
    n = graph.poses.shape[0]

    def gn_step(it, carry):
        poses, _cost = carry
        g = graph._replace(poses=poses)
        zero = jnp.zeros((n, 6), jnp.float32)

        # IRLS robust weights from the CURRENT residuals, fixed for this
        # linearization.
        r_edges = _edge_residuals(zero, g)  # (E, 6), already edge-weighted
        if huber_delta > 0:
            rn = jnp.linalg.norm(r_edges, axis=-1)
            d2 = jnp.float32(huber_delta * huber_delta)
            w_huber = jnp.minimum(1.0, huber_delta / jnp.maximum(rn, 1e-12))
            w_gm = (d2 / (rn * rn + d2)) ** 2
            use_gm = it >= gn_iters // 2
            w_rob = jnp.sqrt(jnp.where(use_gm, w_gm, w_huber))
        else:
            w_rob = jnp.ones(r_edges.shape[0], jnp.float32)

        def res_flat(tw):
            return (
                _edge_residuals(tw.reshape(n, 6), g) * w_rob[:, None]
            ).reshape(-1)

        r0 = res_flat(zero.reshape(-1))
        _, vjp = jax.vjp(res_flat, zero.reshape(-1))

        def matvec(v):
            _, jv = jax.jvp(res_flat, (zero.reshape(-1),), (v,))
            (jtjv,) = vjp(jv)
            return jtjv + damping * v

        (grad,) = vjp(r0)
        dx = _cg(matvec, -grad, cg_iters)
        tw = dx.reshape(n, 6).at[0].set(0.0)
        new_poses = se3.compose(se3.exp(tw), poses)
        cost = 0.5 * jnp.sum(r0 * r0)
        return new_poses, cost

    poses, cost = jax.lax.fori_loop(
        0, gn_iters, gn_step, (graph.poses, jnp.float32(0.0))
    )
    # Report the cost at the final poses.
    final_r = _edge_residuals(jnp.zeros((n, 6), jnp.float32), graph._replace(poses=poses))
    return poses, 0.5 * jnp.sum(final_r * final_r)
