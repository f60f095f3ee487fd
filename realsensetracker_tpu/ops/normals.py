"""Surface normal estimation: kNN/PCA (parity) and image-grid (fast path).

Reference: ComputeNormals (point_cloud_utils.cpp:176-204) does a per-point
kNN -> neighborhood covariance -> SelfAdjointEigenSolver, taking the
eigenvector of the smallest eigenvalue; OrientNormals (:206-216) flips
normals to face the viewpoint. Here:

* `knn_pca_normals` reproduces those semantics exactly with batched dense
  kNN + batched 3x3 eigendecomposition (vmap over points).
* `grid_normals` is the TPU production path: on an organized vertex map the
  tangent basis comes from central differences, so the normal is a cross
  product -- no neighbor search at all. This is what feeds projective
  point-to-plane ICP.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from realsensetracker_tpu.ops import correspond
from realsensetracker_tpu.ops.cloud import Cloud


@partial(jax.jit, static_argnames=("k",))
def knn_pca_normals(cloud: Cloud, k: int = 16) -> jnp.ndarray:
    """Per-point PCA normals over k nearest neighbors (self included).

    Matches reference ComputeNormals (point_cloud_utils.cpp:176-204): the
    kNN set includes the query point itself (it is in the search tree), the
    covariance is the *unnormalized* scatter matrix, and the normal is the
    smallest-eigenvalue eigenvector.
    """
    idx, d2 = correspond.knn(cloud.points, cloud, k)
    # Weight out _BIG-distance padding (fewer than k valid candidates):
    # phantom zero-rows would otherwise rotate sparse-cloud normals toward
    # the origin. The C++ tree always has >= k real points.
    real = d2 < 1e29
    wn = real.astype(cloud.points.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(real, axis=-1), 1).astype(cloud.points.dtype)
    nbrs = cloud.points[idx] * wn  # (N, k, 3)
    ctr = jnp.sum(nbrs, axis=-2, keepdims=True) / cnt[:, None, None]
    delta = (cloud.points[idx] - ctr) * wn
    cov = jnp.einsum("nki,nkj->nij", delta, delta,
                     precision=jax.lax.Precision.HIGHEST)
    # eigh returns ascending eigenvalues; column 0 = smallest, as Eigen's
    # SelfAdjointEigenSolver eigenvectors().col(0).
    _, vecs = jnp.linalg.eigh(cov)
    return vecs[..., :, 0]


def orient_normals(
    points: jnp.ndarray, normals: jnp.ndarray, viewpoint: jnp.ndarray
) -> jnp.ndarray:
    """Flip normals so they face the viewpoint (ref OrientNormals,
    point_cloud_utils.cpp:206-216: flip when (p - viewpoint) . n > 0)."""
    ray = points - viewpoint
    flip = jnp.sum(ray * normals, axis=-1) > 0
    return jnp.where(flip[..., None], -normals, normals)


def grid_normals(vertex_map: jnp.ndarray, valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normals of an organized vertex map (..., H, W, 3) via central differences.

    Returns (normals, normal_valid). Normals are oriented toward the camera
    (origin), matching the reference's camera-facing convention. Pure
    elementwise/shift ops -> VPU-friendly, fuses with unprojection.
    """
    right = jnp.roll(vertex_map, -1, axis=-2)
    left = jnp.roll(vertex_map, 1, axis=-2)
    down = jnp.roll(vertex_map, -1, axis=-3)
    up = jnp.roll(vertex_map, 1, axis=-3)
    v_r = jnp.roll(valid, -1, axis=-1)
    v_l = jnp.roll(valid, 1, axis=-1)
    v_d = jnp.roll(valid, -1, axis=-2)
    v_u = jnp.roll(valid, 1, axis=-2)

    du = right - left
    dv = down - up
    n = jnp.cross(du, dv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    ok = (
        valid
        & v_r
        & v_l
        & v_d
        & v_u
        & (norm[..., 0] > 1e-12)
    )
    # Border pixels wrap with roll; mark them invalid.
    h, w = vertex_map.shape[-3], vertex_map.shape[-2]
    row = jnp.arange(h)
    col = jnp.arange(w)
    interior = (
        (row[:, None] > 0) & (row[:, None] < h - 1) & (col[None, :] > 0) & (col[None, :] < w - 1)
    )
    ok = ok & interior
    n = n / jnp.maximum(norm, 1e-12)
    # Orient toward camera at origin: want n . p < 0.
    flip = jnp.sum(n * vertex_map, axis=-1) > 0
    n = jnp.where(flip[..., None], -n, n)
    n = jnp.where(ok[..., None], n, 0.0)
    return n, ok
