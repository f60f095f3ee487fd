"""Loop-closure detection: place recognition over keyframe descriptors.

The reference's structure.txt:1-9 lists a `loop_closure` module ("DBoW,
...") that was never implemented. TPU-native realization: each keyframe is
summarized by a global descriptor pooled from its FPFH point features
(mean + max pooling -> 66-D), the database is a fixed-capacity matrix, and
querying is one matmul of the query descriptor against all stored ones --
the bag-of-words tree becomes a dense similarity product. Candidates are
geometrically verified with the GNC-TLS robust registrar before an edge is
emitted for pose-graph optimization (optimize/pose_graph.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

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


@dataclass
class KeyframeDatabase:
    """Host-side keyframe store + dense similarity place recognition."""

    min_separation: int = 10  # skip temporally adjacent keyframes
    similarity_threshold: float = 0.95  # cosine similarity gate

    _descriptors: list = field(default_factory=list)
    _clouds: list = field(default_factory=list)
    _feats: list = field(default_factory=list)
    _ids: list = field(default_factory=list)

    def __len__(self) -> int:
        return len(self._ids)

    def add(self, frame_id: int, cloud: cloud_mod.Cloud, feats: jnp.ndarray) -> None:
        self._descriptors.append(np.asarray(global_descriptor(feats, cloud.mask)))
        self._clouds.append(cloud)
        self._feats.append(feats)
        self._ids.append(int(frame_id))

    def query(self, frame_id: int, cloud: cloud_mod.Cloud, feats: jnp.ndarray, top_k: int = 3):
        """Return [(candidate_frame_id, similarity), ...] above threshold,
        excluding temporally nearby keyframes."""
        if not self._ids:
            return []
        q = np.asarray(global_descriptor(feats, cloud.mask))
        D = np.stack(self._descriptors)  # (K, 66)
        sims = D @ q  # one dense product = the whole vocabulary lookup
        order = np.argsort(-sims)
        out = []
        for k in order[: top_k * 4]:
            cand_id = self._ids[k]
            if abs(cand_id - frame_id) < self.min_separation:
                continue
            if sims[k] < self.similarity_threshold:
                break
            out.append((cand_id, float(sims[k])))
            if len(out) >= top_k:
                break
        return out

    def verify(self, frame_id_a: int, cloud_a, feats_a, candidate_id: int,
               noise_bound: float = 0.25, min_inliers: int = 10,
               min_inlier_fraction: float = 0.3,
               overlap_tau: float = 0.05, min_overlap: float = 0.6):
        """Geometric verification: robust global registration of the query
        against a candidate. Returns (T_ab (4,4), ok) -- a loop edge when ok.

        ok requires (a) enough ABSOLUTE inliers, (b) a minimum inlier
        FRACTION of the correspondences, and (c) SYMMETRIC CLOUD OVERLAP
        under the estimated transform: min(fwd, bwd) fraction of points
        within overlap_tau of the other cloud >= min_overlap. (c) is the
        check that rejects confidently wrong GNC fits on self-similar
        geometry (repeated spheres): those align only their own inlier
        subset, scoring <= ~0.35 where true loops score ~1.0, so no
        odometry prior is needed to reject them."""
        from realsensetracker_tpu.align import robust_global

        k = self._ids.index(candidate_id)
        res = robust_global.register_robust(
            cloud_a, self._clouds[k], feats_a, self._feats[k], noise_bound
        )
        n_corr = max(int(res.num_correspondences), 1)
        frac = int(res.num_inliers) / n_corr
        ok = (
            bool(res.valid)
            and int(res.num_inliers) >= min_inliers
            and frac >= min_inlier_fraction
        )
        if ok:
            fwd, bwd = robust_global.symmetric_overlap(
                res.transform, cloud_a, self._clouds[k], overlap_tau
            )
            ok = min(float(fwd), float(bwd)) >= min_overlap
        T = res.transform
        if ok:
            # ICP-refine the accepted coarse transform (the reference's own
            # recipe: robust/FPFH init -> AlignIcp3d refine,
            # rs_align_app.cpp:292-308). The global registration is
            # centimeter-accurate at best; a pose-graph edge that coarse
            # DEGRADES millimeter-accurate odometry, so refine to local
            # optimality and keep the refinement only if it does not lose
            # overlap.
            from realsensetracker_tpu.align import icp as icp_mod

            ref = icp_mod.align_icp(
                cloud_a, self._clouds[k], max_iter=64, init_transform=T
            )
            if bool(jnp.all(jnp.isfinite(ref.transform))):
                f2, b2 = robust_global.symmetric_overlap(
                    ref.transform, cloud_a, self._clouds[k], overlap_tau
                )
                if min(float(f2), float(b2)) >= min(float(fwd), float(bwd)):
                    T = ref.transform
        return T, ok
