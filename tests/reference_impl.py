"""Pure-NumPy transcription of the reference's registration math.

This is the golden oracle for parity tests: a faithful, scalar-looped NumPy
reimplementation of the C++ semantics (align_icp.cpp, point_cloud_utils.cpp,
fpfh.cpp, rs_align_app.cpp), written against SURVEY.md's behavioral notes.
Slow by design -- only run on small clouds.
"""

from __future__ import annotations

import numpy as np


def solve_kabsch_np(src, dst, pairs, weights=None):
    """SolveKabsch (align_icp.cpp:18-71). pairs: list of (i_src, i_dst)."""
    src = np.asarray(src, np.float32)
    dst = np.asarray(dst, np.float32)
    if len(src) < 3 or len(dst) < 3:
        return None
    src_mean = np.zeros(3, np.float32)
    dst_mean = np.zeros(3, np.float32)
    for i, j in pairs:
        src_mean += src[i]
        dst_mean += dst[j]
    src_mean /= len(pairs)
    dst_mean /= len(pairs)

    cov = np.zeros((3, 3), np.float64)
    for c, (i, j) in enumerate(pairs):
        w = 1.0 if weights is None else weights[c]
        cov += w * np.outer(dst[j] - dst_mean, src[i] - src_mean).astype(np.float64)

    u, _, vt = np.linalg.svd(cov)
    R = (u @ vt).astype(np.float32)
    if np.linalg.det(R) < 0:
        R[:, 2] *= -1
    t = dst_mean - R @ src_mean
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def align_icp_np(src, dst, max_iter=128, init=None):
    """AlignIcp3d (align_icp.cpp:73-161): GNC-weighted SVD ICP.

    Returns (T, mean_cost). Brute-force exact 1-NN stands in for the KD-tree.
    """
    src = np.asarray(src, np.float32)
    dst = np.asarray(dst, np.float32)
    n = len(src)
    T = np.eye(4, dtype=np.float32) if init is None else np.array(init, np.float32)
    # C++ ComputeCentroid accumulates in float32 (point_cloud_utils.cpp:92-98)
    src_mean = np.zeros(3, np.float32)
    for i in range(n):
        src_mean += src[i]
    src_mean = src_mean * np.float32(1.0 / n)

    mu = np.float32(1.0)
    cost = np.float32(0.0)
    for it in range(max_iter):
        if it > 0 and it % 8 == 0:
            mu = np.float32(mu / np.float32(1.4))
        R, t = T[:3, :3], T[:3, 3]
        p = src @ R.T + t
        d2_all = ((p[:, None, :] - dst[None, :, :]) ** 2).sum(-1)
        nbrs = np.argmin(d2_all, axis=1)
        d2 = d2_all[np.arange(n), nbrs]
        cost = np.float32(d2.sum())
        l_rt = mu / (d2 + mu)
        w = (l_rt * l_rt).astype(np.float32)
        dst_mean = dst[nbrs].astype(np.float32).sum(0) / np.float32(n)

        cov = np.zeros((3, 3), np.float64)
        for i in range(n):
            cov += (
                w[i] * np.outer(dst[nbrs[i]] - dst_mean, src[i] - src_mean)
            ).astype(np.float64)

        u, _, vt = np.linalg.svd(cov)
        Rn = (u @ vt).astype(np.float32)
        if np.linalg.det(Rn) < 0:
            Rn[:, 2] *= -1
        tn = dst_mean - Rn @ src_mean
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rn
        T[:3, 3] = tn
    mean_cost = float(np.sqrt(cost / n))
    return T, mean_cost


def downsample_voxel_np(points, voxel_size):
    """DownsampleVoxel (point_cloud_utils.cpp:34-68): first-point-wins per
    voxel. Returns the selected point indices in insertion order."""
    seen = {}
    for i, p in enumerate(np.asarray(points, np.float32)):
        key = tuple(np.floor(p / voxel_size).astype(np.int64))
        if key not in seen:
            seen[key] = i
    return list(seen.values())


def compute_normals_np(points, k=16):
    """ComputeNormals (point_cloud_utils.cpp:176-204): kNN (self included),
    scatter-matrix eigendecomposition, smallest-eigenvalue eigenvector."""
    points = np.asarray(points, np.float32)
    n = len(points)
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    out = np.zeros((n, 3), np.float32)
    for i in range(n):
        idx = np.argsort(d2[i], kind="stable")[:k]
        nbrs = points[idx]
        ctr = nbrs.mean(0)
        delta = nbrs - ctr
        cov = delta.T @ delta
        vals, vecs = np.linalg.eigh(cov)
        out[i] = vecs[:, 0]
    return out


def orient_normals_np(points, normals, viewpoint):
    """OrientNormals (point_cloud_utils.cpp:206-216)."""
    normals = np.array(normals, np.float32)
    for i in range(len(points)):
        if np.dot(points[i] - viewpoint, normals[i]) > 0:
            normals[i] *= -1
    return normals


def compute_pfh_np(p1, n1, p2, n2):
    """ComputePfh (fpfh.cpp:21-67). Returns (f (3,), success)."""
    delta = p2 - p1
    distance = np.linalg.norm(delta)
    if distance == 0.0:
        return np.zeros(3, np.float32), False
    delta = delta / distance
    n1_d = float(np.dot(n1, delta))
    n2_d = float(np.dot(n2, delta))
    if abs(n1_d) < abs(n2_d):
        u_d, nt_d = -n2_d, -n1_d
    else:
        u_d, nt_d = n1_d, n2_d
    if abs(u_d) >= 1.0:
        return np.zeros(3, np.float32), False
    v_norm = np.sqrt(1.0 - u_d * u_d)
    n1n2 = float(np.dot(n1, n2))
    f = np.zeros(3, np.float32)
    f[0] = np.arctan2(nt_d - n1n2 * u_d, n1n2 * v_norm)
    f[1] = float(np.dot(delta, np.cross(n1, n2))) / v_norm
    f[2] = u_d
    return f, True


def compute_fpfh_np(points, normals, radius):
    """ComputeSpfh + ComputeFpfhImpl (fpfh.cpp:69-176), radius neighborhoods."""
    points = np.asarray(points, np.float32)
    n = len(points)
    num_bins, size = 11, 33
    scale = np.array([1.0 / (2 * np.pi), 0.5, 0.5])
    d = np.linalg.norm(points[:, None] - points[None, :], axis=-1)
    nbrs = [np.where(d[i] <= radius)[0] for i in range(n)]  # includes self

    spfhs = np.zeros((n, size), np.float32)
    for i in range(n):
        nb = nbrs[i]
        if len(nb) <= 1:
            continue
        dhist = 1.0 / (len(nb) - 1)
        for j in nb:
            if j == i:
                continue
            f, suc = compute_pfh_np(points[i], normals[i], points[j], normals[j])
            if suc:
                for k in range(3):
                    h = int(np.floor(num_bins * (f[k] * scale[k] + 0.5)))
                    h = max(0, min(num_bins - 1, h))
                    spfhs[i, k * num_bins + h] += dhist

    fpfh = np.zeros((n, size), np.float32)
    for i in range(n):
        for j in nbrs[i]:
            if j == i:
                continue
            fpfh[i] += (1.0 / d[i, j]) * spfhs[j]
        for k in range(3):
            seg = fpfh[i, k * num_bins : (k + 1) * num_bins]
            q = seg.sum()
            if q > 0:
                fpfh[i, k * num_bins : (k + 1) * num_bins] = seg / q
    return fpfh


def prune_matches_lowe_np(matches, src_fpfh, dst_fpfh, lowe_ratio):
    """PruneMatchesLowe (rs_align_app.cpp:177-217)."""
    pairs, weights = [], []
    k_var = 0.25 * 0.25
    for i in range(matches.shape[0]):
        j0, j1 = int(matches[i, 0]), int(matches[i, 1])
        d0 = float(((src_fpfh[i] - dst_fpfh[j0]) ** 2).sum())
        d1 = float(((src_fpfh[i] - dst_fpfh[j1]) ** 2).sum())
        if d0 < d1:
            if d0 < lowe_ratio * d1:
                pairs.append((i, j0))
                weights.append(np.exp(-d0 / k_var))
        else:
            if d1 < lowe_ratio * d0:
                pairs.append((i, j1))
                weights.append(np.exp(-d1 / k_var))
    return pairs, weights
