"""GICP: plane-to-plane registration with Mahalanobis whitening.

Replaces the reference's Ceres-based stack (align_gicp.cpp + gicp_cost.hpp)
with an analytic Gauss-Newton/Levenberg solver on se(3):

* per-point neighborhood covariances: ComputeCovariances
  (point_cloud_utils.cpp:100-161) -- 32-NN excluding self, scatter/(k-1),
  with the optional GICP regularization that rebuilds the covariance from
  singular vectors with singular values (1, 1, 1e-2);
* residual r = (C_dst + R C_src R^T)^{-1/2} (R p + t - q), exactly the
  GICPCost functor (gicp_cost.hpp:40-73), with the whitening matrix held
  fixed per iteration (standard GICP linearization) instead of autodiffed
  through the eigendecomposition as Ceres does -- identical fixed points
  when residuals vanish;
* robust loss: Ceres HuberLoss(0.5) IRLS weights (align_gicp.cpp:67);
* outer loop: kMaxIter=16 rounds of correspondences -> solve, re-seeded
  from the running estimate (align_gicp.cpp:134-159), each round running a
  fixed number of damped GN steps in place of Ceres LM's <=1024 iterations.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from realsensetracker_tpu.geometry import se3
from realsensetracker_tpu.ops import correspond
from realsensetracker_tpu.ops.cloud import Cloud


@partial(jax.jit, static_argnames=("k", "use_gicp"))
def compute_covariances(cloud: Cloud, k: int = 32, use_gicp: bool = False) -> jnp.ndarray:
    """Per-point neighborhood covariances (N, 3, 3).

    Reference ComputeCovariances (point_cloud_utils.cpp:100-161): searches
    k+1 neighbors and skips the first (self), centers on the neighbor
    centroid, and either divides by (k-1) or applies the GICP
    singular-value remap (1, 1, 1e-2).
    """
    idx, d2 = correspond.knn_self(cloud, k)
    # Fewer than k valid candidates: knn_self pads with _BIG-distance
    # entries whose indices land on masked (zero) rows. Weight those out --
    # the C++ tree always returns k REAL points, and phantom origins would
    # otherwise drag every sparse-cloud covariance toward the origin.
    real = d2 < 1e29
    wn = real.astype(cloud.points.dtype)[..., None]  # (N, k, 1)
    cnt = jnp.maximum(jnp.sum(real, axis=-1), 1).astype(cloud.points.dtype)
    nbrs = cloud.points[idx] * wn  # (N, k, 3)
    ctr = jnp.sum(nbrs, axis=-2, keepdims=True) / cnt[:, None, None]
    delta = (cloud.points[idx] - ctr) * wn
    cov = jnp.einsum("nki,nkj->nij", delta, delta, precision=jax.lax.Precision.HIGHEST)
    if use_gicp:
        # Covariance is symmetric PSD: singular vectors = eigenvectors,
        # descending singular values = reversed ascending eigenvalues.
        _, vecs = jnp.linalg.eigh(cov)
        u = vecs[..., ::-1]  # descending order columns
        vals = jnp.asarray([1.0, 1.0, 1e-2], cov.dtype)
        return jnp.einsum("nik,k,njk->nij", u, vals, u,
                          precision=jax.lax.Precision.HIGHEST)
    return cov / jnp.maximum(cnt - 1.0, 1.0)[:, None, None]


def _whitening(M: jnp.ndarray) -> jnp.ndarray:
    """Symmetric inverse square root of PSD 3x3 matrices (gicp_cost.hpp:57-68)."""
    vals, vecs = jnp.linalg.eigh(M)
    inv_sqrt = jax.lax.rsqrt(jnp.maximum(vals, 1e-12))
    return jnp.einsum("...ik,...k,...jk->...ij", vecs, inv_sqrt, vecs,
                      precision=jax.lax.Precision.HIGHEST)


@jax.custom_jvp
def _whitening_diff(M: jnp.ndarray) -> jnp.ndarray:
    """_whitening with a ROBUST matrix-function derivative.

    Ceres evaluates gicp_cost.hpp:57-68 under ceres::Jet, i.e. it
    differentiates THROUGH the eigendecomposition rsqrt. jnp.linalg.eigh's
    builtin JVP divides by eigenvalue gaps (singular for the repeated
    eigenvalues every isotropic neighborhood produces), so this custom_jvp
    implements the Daleckii-Krein formula for f(M) = M^{-1/2} instead:
    dW = V (A * G) V^T with A = V^T dM V and G_ij the divided difference
    (f(l_i) - f(l_j)) / (l_i - l_j), which limits to f'(l) as gaps close --
    the exact derivative of the matrix FUNCTION, finite for any PSD input.
    """
    return _whitening(M)


@_whitening_diff.defjvp
def _whitening_diff_jvp(primals, tangents):
    (M,) = primals
    (dM,) = tangents
    vals, vecs = jnp.linalg.eigh(M)
    lam = jnp.maximum(vals, 1e-12)
    f = jax.lax.rsqrt(lam)
    W = jnp.einsum("...ik,...k,...jk->...ij", vecs, f, vecs,
                   precision=jax.lax.Precision.HIGHEST)
    # Divided-difference table G_ij = (f_i - f_j) / (l_i - l_j), guarded to
    # f'(l) = -1/2 l^{-3/2} when the gap vanishes.
    li = lam[..., :, None]
    lj = lam[..., None, :]
    fi = f[..., :, None]
    fj = f[..., None, :]
    gap = li - lj
    small = jnp.abs(gap) < 1e-9 * jnp.maximum(li, lj)
    deriv = -0.5 * jax.lax.rsqrt(li) / li  # -1/2 l^{-3/2}
    G = jnp.where(small, deriv, (fi - fj) / jnp.where(small, 1.0, gap))
    A = jnp.einsum("...ki,...kl,...lj->...ij", vecs, dM, vecs,
                   precision=jax.lax.Precision.HIGHEST)
    dW = jnp.einsum("...ik,...kl,...jl->...ij", vecs, A * G, vecs,
                    precision=jax.lax.Precision.HIGHEST)
    return W, dW


def _huber_weight(s: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Ceres HuberLoss rho'(s) for squared residual norm s, b = delta^2."""
    b = delta * delta
    return jnp.where(s <= b, 1.0, jnp.sqrt(b / jnp.maximum(s, 1e-30)))


class GicpResult(NamedTuple):
    transform: jnp.ndarray
    cost: jnp.ndarray  # 0.5 * sum rho(|r|^2), Ceres final_cost convention
    num_valid: jnp.ndarray


def solve_alignment(
    src_points: jnp.ndarray,  # (N, 3) matched source points
    dst_points: jnp.ndarray,  # (N, 3) matched destination points
    src_covs: jnp.ndarray,  # (N, 3, 3)
    dst_covs: jnp.ndarray,  # (N, 3, 3)
    pair_mask: jnp.ndarray,  # (N,)
    seed: jnp.ndarray,  # (4, 4)
    inner_iters: int = 8,
    huber_delta: float = 0.5,
    damping: float = 1e-6,
    whitening: str = "fixed",
):
    """Inner NLLS solve (ref inner ComputeAlignment, align_gicp.cpp:41-103).

    Damped Gauss-Newton with per-iteration re-whitening; returns (T, cost).

    whitening: "fixed" holds W constant per GN step (standard GICP
    linearization; the default); "autodiff" differentiates THROUGH the
    eigendecomposition rsqrt like Ceres's Jet evaluation of
    gicp_cost.hpp:57-68 does (see _whitening_diff), so the Gauss-Newton
    direction includes the dW/dR term. Both share every fixed point (the
    extra term is dW · e, which vanishes with the residual); measured on
    anisotropic-covariance scenes the mid-iteration step directions differ
    by ~2-6 degrees and convergence is indistinguishable
    (tests/test_gicp.py::TestAutodiffWhitening), so "fixed" -- one eigh
    instead of seven per point per step -- stays the default.
    """
    m = pair_mask.astype(jnp.float32)

    def residuals_at(T):
        """Whitened residuals r(T) = (C_dst + R C_src R^T)^{-1/2} (R p + t - q),
        differentiable through the whitening (gicp_cost.hpp:40-73)."""
        R = se3.rotation(T)
        p = se3.transform_points(T, src_points)
        e = p - dst_points
        M = dst_covs + jnp.einsum(
            "ij,njk,lk->nil", R, src_covs, R, precision=jax.lax.Precision.HIGHEST
        )
        W = _whitening_diff(M)
        r = jnp.einsum("nij,nj->ni", W, e, precision=jax.lax.Precision.HIGHEST)
        return r, (p, W)

    def body(_, T):
        r, (p, W) = residuals_at(T)
        s = jnp.sum(r * r, axis=-1)
        w = _huber_weight(s, huber_delta) * m

        if whitening == "autodiff":
            # Exact J = dr/d(delta) at delta = 0 for T' = exp(delta) T,
            # including the whitening derivative (Ceres-equivalent).
            def r_of_delta(delta):
                return residuals_at(se3.compose(se3.exp(delta), T))[0]

            J = jax.jacfwd(r_of_delta)(jnp.zeros(6, jnp.float32))  # (N, 3, 6)
        else:
            # Fixed-W linearization: J_pt = [I | -hat(p')] for left twist
            # [v, w]; J = W @ J_pt (N, 3, 6).
            hat_p = se3.hat(p)  # (N, 3, 3)
            J_rot = -jnp.einsum(
                "nij,njk->nik", W, hat_p, precision=jax.lax.Precision.HIGHEST
            )
            J = jnp.concatenate([W, J_rot], axis=-1)  # (N, 3, 6)
        H = jnp.einsum("n,nri,nrj->ij", w, J, J, precision=jax.lax.Precision.HIGHEST)
        g = jnp.einsum("n,nri,nr->i", w, J, r, precision=jax.lax.Precision.HIGHEST)
        lam = damping * jnp.trace(H) + 1e-12
        delta = -jnp.linalg.solve(H + lam * jnp.eye(6, dtype=H.dtype), g)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
        T_new = se3.compose(se3.exp(delta), T)

        return T_new

    def cost_at(T):
        r, _ = residuals_at(T)
        s = jnp.sum(r * r, axis=-1)
        b = huber_delta * huber_delta
        rho = jnp.where(s <= b, s, 2.0 * jnp.sqrt(b * jnp.maximum(s, 0.0)) - b)
        return 0.5 * jnp.sum(rho * m)

    T_fin = jax.lax.fori_loop(0, inner_iters, body, seed)
    # Cost is evaluated AT the returned transform (true Ceres final_cost
    # convention) -- the in-loop value would lag one GN step behind the
    # pose it is reported with.
    return T_fin, cost_at(T_fin)


@partial(jax.jit, static_argnames=("max_outer", "inner_iters", "cov_k", "use_gicp_cov", "chunk", "whitening"))
def align_gicp(
    src: Cloud,
    dst: Cloud,
    max_outer: int = 16,
    inner_iters: int = 8,
    cov_k: int = 32,
    use_gicp_cov: bool = False,
    huber_delta: float = 0.5,
    chunk: int = 2048,
    whitening: str = "fixed",
) -> GicpResult:
    """Full GICP (ref outer ComputeAlignment, align_gicp.cpp:105-163).

    Note the reference passes use_gicp=false to ComputeCovariances
    (align_gicp.cpp:121-123), i.e. plain scatter/(k-1) covariances by
    default; set use_gicp_cov=True for the regularized textbook variant.
    """
    src_covs = compute_covariances(src, cov_k, use_gicp_cov)
    dst_covs = compute_covariances(dst, cov_k, use_gicp_cov)

    def outer(_, carry):
        T, _cost = carry
        p = se3.transform_points(T, src.points)
        nn_idx, _ = correspond.nearest_neighbors(p, dst, chunk=chunk)
        T_new, cost = solve_alignment(
            src.points,
            dst.points[nn_idx],
            src_covs,
            dst_covs[nn_idx],
            src.mask,
            T,
            inner_iters=inner_iters,
            huber_delta=huber_delta,
            whitening=whitening,
        )
        # NaN guard (align_gicp.cpp:146-151): keep the previous estimate AND
        # its cost -- a rejected step must not report the divergent value.
        ok = jnp.all(jnp.isfinite(T_new)) & jnp.isfinite(cost)
        return jnp.where(ok, T_new, T), jnp.where(ok, cost, _cost)

    # Cost seeds at inf (the reference aborts with infinity when the very
    # first solve degenerates, align_gicp.cpp:146-151).
    T, cost = jax.lax.fori_loop(
        0, max_outer, outer, (se3.identity(), jnp.float32(jnp.inf))
    )
    return GicpResult(transform=T, cost=cost, num_valid=jnp.sum(src.mask))
