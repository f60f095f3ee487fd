"""Loop-closure detection: place recognition over keyframe descriptors.

The reference's structure.txt:1-9 lists a `loop_closure` module ("DBoW,
...") that was never implemented. TPU-native realization: each keyframe is
summarized by a global descriptor pooled from its FPFH point features
(mean + max pooling -> 66-D); the database is a FIXED-CAPACITY set of
device-resident matrices (descriptors (K, 66), clouds (K, N, 3) + masks,
features (K, N, 33)), so querying is one matmul of the query descriptor
against the whole store and geometric verification of ALL candidates of a
query runs as ONE vmapped device dispatch (register_robust +
symmetric_overlap + ICP refine per candidate) -- the per-candidate ~45 ms
relay dispatch tax of the round-2 host-loop design is paid once per
keyframe, independent of candidate count. Accepted candidates become edges
for pose-graph optimization (optimize/pose_graph.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.ops import cloud as cloud_mod
from realsensetracker_tpu.ops import fpfh as fpfh_mod

DESCRIPTOR_DIM = 2 * fpfh_mod.FPFH_SIZE  # mean-pool + max-pool halves


def global_descriptor(feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Pool per-point FPFH features (N, 33) into one L2-normalized 66-D
    place descriptor."""
    m = mask.astype(feats.dtype)[:, None]
    denom = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(feats * m, axis=0) / denom
    mx = jnp.max(jnp.where(m > 0, feats, -jnp.inf), axis=0)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    d = jnp.concatenate([mean, mx])
    return d / jnp.maximum(jnp.linalg.norm(d), 1e-12)


@partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _insert_row(desc_s, pts_s, mask_s, feats_s, k, pts, mask, feats):
    """Insert one keyframe into all four store matrices (descriptor
    computed in-program) as ONE device dispatch. Through the axon relay
    each eager `.at[].set` plus the eager descriptor pooling previously
    cost its own ~45 ms round trip per insertion. The stores are DONATED:
    the caller always rebinds them, and without donation XLA copies the
    full (K, N, *) buffers (hundreds of MB at capacity) on every insert."""
    return (
        desc_s.at[k].set(global_descriptor(feats, mask)),
        pts_s.at[k].set(pts.astype(jnp.float32)),
        mask_s.at[k].set(mask),
        feats_s.at[k].set(feats.astype(jnp.float32)),
    )


@partial(jax.jit, static_argnames=("noise_bound", "min_inliers",
                                   "min_inlier_fraction", "overlap_tau",
                                   "min_overlap", "refine_iters"))
def _verify_candidates(
    q_pts, q_mask, q_feats,           # query keyframe
    pts_s, mask_s, feats_s,           # (K, N, ...) FULL keyframe stores
    idx,                              # (C,) candidate row indices
    noise_bound: float,
    min_inliers: int,
    min_inlier_fraction: float,
    overlap_tau: float,
    min_overlap: float,
    refine_iters: int,
):
    """Geometric verification of ALL candidates in one dispatch.

    Takes the full device-resident stores plus the candidate row indices
    and gathers in-program, so the three store gathers do not each pay
    their own relay dispatch; the program recompiles only when the store
    capacity doubles.

    Per candidate (vmapped): robust global registration of the query onto
    the candidate, symmetric-overlap acceptance, then ICP refinement of the
    coarse transform kept only when it does not lose overlap (the
    reference's own robust-init -> AlignIcp3d recipe,
    rs_align_app.cpp:292-308). ok requires (a) enough ABSOLUTE inliers,
    (b) a minimum inlier FRACTION, and (c) SYMMETRIC CLOUD OVERLAP under
    the estimated transform: min(fwd, bwd) fraction of points within
    overlap_tau of the other cloud >= min_overlap. (c) rejects confidently
    wrong GNC fits on self-similar geometry (repeated spheres): those align
    only their own inlier subset, scoring <= ~0.35 where true loops score
    ~1.0, so no odometry prior is needed to reject them.

    Returns (T (C, 4, 4), ok (C,), overlap (C,)).
    """
    from realsensetracker_tpu.align import icp as icp_mod
    from realsensetracker_tpu.align import robust_global

    def one(cp, cm, cf):
        cloud_q = cloud_mod.Cloud(points=q_pts, mask=q_mask)
        cloud_c = cloud_mod.Cloud(points=cp, mask=cm)
        res = robust_global.register_robust(
            cloud_q, cloud_c, q_feats, cf, noise_bound
        )
        n_corr = jnp.maximum(res.num_correspondences, 1)
        frac = res.num_inliers / n_corr
        fwd, bwd = robust_global.symmetric_overlap(
            res.transform, cloud_q, cloud_c, overlap_tau
        )
        ov = jnp.minimum(fwd, bwd)
        ok = (
            res.valid
            & (res.num_inliers >= min_inliers)
            & (frac >= min_inlier_fraction)
            & (ov >= min_overlap)
        )
        # ICP-refine (always computed -- fixed shape); keep only if the
        # refinement is finite and does not lose overlap.
        ref = icp_mod.align_icp(
            cloud_q, cloud_c, max_iter=refine_iters, init_transform=res.transform
        )
        f2, b2 = robust_global.symmetric_overlap(
            ref.transform, cloud_q, cloud_c, overlap_tau
        )
        use_ref = jnp.all(jnp.isfinite(ref.transform)) & (
            jnp.minimum(f2, b2) >= ov
        )
        T = jnp.where(use_ref, ref.transform, res.transform)
        return T, ok, ov

    return jax.vmap(one)(pts_s[idx], mask_s[idx], feats_s[idx])


@dataclass
class KeyframeDatabase:
    """Device-resident keyframe store + dense similarity place recognition."""

    min_separation: int = 10  # skip temporally adjacent keyframes
    similarity_threshold: float = 0.95  # cosine similarity gate
    capacity: int = 256  # keyframe slots (grows by doubling when exceeded)

    _desc: object = None   # (K, 66) device
    _pts: object = None    # (K, N, 3) device
    _mask: object = None   # (K, N) device
    _feats: object = None  # (K, N, 33) device
    _ids: list = field(default_factory=list)  # host frame ids, insert order

    def __len__(self) -> int:
        return len(self._ids)

    def _ensure_store(self, cloud: cloud_mod.Cloud, feats: jnp.ndarray) -> None:
        n = cloud.capacity
        if self._desc is None:
            k = self.capacity
            self._desc = jnp.zeros((k, DESCRIPTOR_DIM), jnp.float32)
            self._pts = jnp.zeros((k, n, 3), jnp.float32)
            self._mask = jnp.zeros((k, n), bool)
            self._feats = jnp.zeros((k, n, fpfh_mod.FPFH_SIZE), jnp.float32)
        elif len(self._ids) >= self._desc.shape[0]:
            # Double the store (amortized O(1) copies).
            self._desc = jnp.concatenate([self._desc, jnp.zeros_like(self._desc)])
            self._pts = jnp.concatenate([self._pts, jnp.zeros_like(self._pts)])
            self._mask = jnp.concatenate([self._mask, jnp.zeros_like(self._mask)])
            self._feats = jnp.concatenate([self._feats, jnp.zeros_like(self._feats)])

    def add(self, frame_id: int, cloud: cloud_mod.Cloud, feats: jnp.ndarray) -> None:
        self._ensure_store(cloud, feats)
        # Device-array row index: keeps the update ONE cached program for
        # every insertion (a Python int would bake a new constant-index
        # program per row -- hundreds of relay compiles on TPU). All four
        # row writes plus the descriptor pooling fuse into one dispatch.
        k = jnp.int32(len(self._ids))
        self._desc, self._pts, self._mask, self._feats = _insert_row(
            self._desc, self._pts, self._mask, self._feats,
            k, cloud.points, cloud.mask, feats,
        )
        self._ids.append(int(frame_id))

    def query(self, frame_id: int, cloud: cloud_mod.Cloud, feats: jnp.ndarray,
              top_k: int = 3, desc: jnp.ndarray | None = None):
        """Return [(candidate_frame_id, similarity), ...] above threshold,
        excluding temporally nearby keyframes. One device dispatch (the
        similarity matmul); selection on the (K,) host vector.

        desc: optional precomputed query descriptor (the fused keyframe
        prep produces it in-program; recomputing it here would cost extra
        eager dispatches)."""
        if not self._ids:
            return []
        count = len(self._ids)
        q = global_descriptor(feats, cloud.mask) if desc is None else desc
        # Full fixed-shape store matmul (one program per store SIZE, which
        # only changes on doubling); slice to live rows on host.
        sims = np.asarray(self._desc @ q)[:count]
        order = np.argsort(-sims, kind="stable")
        out = []
        for k in order:
            cand_id = self._ids[k]
            if abs(cand_id - frame_id) < self.min_separation:
                continue
            if sims[k] < self.similarity_threshold:
                break
            out.append((cand_id, float(sims[k])))
            if len(out) >= top_k:
                break
        return out

    def verify_batch(self, frame_id_a: int, cloud_a, feats_a,
                     candidate_ids: list,
                     noise_bound: float = 0.25, min_inliers: int = 10,
                     min_inlier_fraction: float = 0.3,
                     overlap_tau: float = 0.05, min_overlap: float = 0.6,
                     refine_iters: int = 64, pad_to: int | None = None):
        """Verify ALL candidates of one query in ONE device dispatch.

        Returns [(T_ab (4,4) np, ok bool), ...] aligned with candidate_ids
        (truncated to the first pad_to candidates when more are passed).
        Cost is independent of len(candidate_ids) up to the vmapped batch
        (the per-candidate compute is data-parallel on-device).

        pad_to: pad the candidate axis to this fixed size (duplicating row
        0; extras are dropped from the result) so every call shares ONE
        compiled program -- on TPU a fresh relay compile per distinct
        candidate count would otherwise cost 30-90 s each.
        """
        out = self.verify_batch_async(
            frame_id_a, cloud_a, feats_a, candidate_ids,
            noise_bound=noise_bound, min_inliers=min_inliers,
            min_inlier_fraction=min_inlier_fraction,
            overlap_tau=overlap_tau, min_overlap=min_overlap,
            refine_iters=refine_iters, pad_to=pad_to,
        )
        if out is None:
            return []
        return self.finish_verify(*out)

    def verify_batch_async(self, frame_id_a, cloud_a, feats_a,
                           candidate_ids: list,
                           noise_bound: float = 0.25, min_inliers: int = 10,
                           min_inlier_fraction: float = 0.3,
                           overlap_tau: float = 0.05,
                           min_overlap: float = 0.6,
                           refine_iters: int = 64,
                           pad_to: int | None = None):
        """Dispatch-only half of verify_batch: submits the vmapped
        verification program and returns (T_dev, ok_dev, kept_ids)
        WITHOUT materializing -- the caller overlaps the device work with
        later host/VO work and collects via finish_verify. None when
        there are no candidates. The deferred-booking SLAM path uses
        this to take loop verification off the tracked frame's critical
        path (the verdicts ride the device stream behind the next
        frame's VO dispatch)."""
        if not candidate_ids:
            return None
        if pad_to is not None and len(candidate_ids) > pad_to:
            # Honor the fixed program shape: verify only the first pad_to
            # candidates (callers rank them by similarity). Silently
            # exceeding pad_to would compile a fresh program per distinct
            # count (30-90 s each through a relay).
            candidate_ids = candidate_ids[:pad_to]
        rows = [self._ids.index(c) for c in candidate_ids]
        if pad_to is not None and len(rows) < pad_to:
            rows = rows + [rows[0]] * (pad_to - len(rows))
        idx = jnp.asarray(rows, jnp.int32)
        T, ok, _ov = _verify_candidates(
            cloud_a.points.astype(jnp.float32), cloud_a.mask,
            feats_a.astype(jnp.float32),
            self._pts, self._mask, self._feats, idx,
            noise_bound=float(noise_bound), min_inliers=int(min_inliers),
            min_inlier_fraction=float(min_inlier_fraction),
            overlap_tau=float(overlap_tau), min_overlap=float(min_overlap),
            refine_iters=int(refine_iters),
        )
        return T, ok, list(candidate_ids)

    @staticmethod
    def finish_verify(T_dev, ok_dev, kept_ids):
        """Materialize a verify_batch_async result: [(T_ab, ok), ...]
        aligned with kept_ids."""
        T = np.asarray(T_dev)
        ok = np.asarray(ok_dev)
        return [(T[i], bool(ok[i])) for i in range(len(kept_ids))]

    def verify(self, frame_id_a: int, cloud_a, feats_a, candidate_id: int,
               noise_bound: float = 0.25, min_inliers: int = 10,
               min_inlier_fraction: float = 0.3,
               overlap_tau: float = 0.05, min_overlap: float = 0.6):
        """Single-candidate wrapper over verify_batch (same semantics)."""
        ((T, ok),) = self.verify_batch(
            frame_id_a, cloud_a, feats_a, [candidate_id],
            noise_bound=noise_bound, min_inliers=min_inliers,
            min_inlier_fraction=min_inlier_fraction,
            overlap_tau=overlap_tau, min_overlap=min_overlap,
        )
        return jnp.asarray(T), ok
