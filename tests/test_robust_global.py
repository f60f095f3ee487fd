"""Robust global registration (GNC-TLS): large-motion recovery with outliers,
the regime where local ICP fails (ref TEASER usage, rs_align_app.cpp:310-314)."""

import jax
import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.align import robust_global
from realsensetracker_tpu.geometry import se3
from realsensetracker_tpu.ops import cloud as cloud_mod


def _scene(key, n=256, scale=1.0):
    return scale * jax.random.normal(key, (n, 3), dtype=jnp.float32)


def _feats_from_identity(n, noise, key):
    """Synthetic descriptors: matched points share a descriptor up to noise."""
    base = jax.random.normal(key, (n, 33), dtype=jnp.float32)
    return base, base + noise * jax.random.normal(jax.random.PRNGKey(99), (n, 33), dtype=jnp.float32)


def _twist_err(T_est, T_true):
    return float(np.abs(np.asarray(se3.log(se3.compose(se3.inverse(T_true), T_est)))).max())


class TestMutualMatches:
    def test_perfect_features_match_identity(self):
        f = jax.random.normal(jax.random.PRNGKey(0), (50, 33), dtype=jnp.float32)
        mask = jnp.ones(50, bool)
        idx, keep = robust_global.mutual_matches(f, f, mask, mask)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(50))
        assert bool(jnp.all(keep))

    def test_cross_check_kills_asymmetric(self):
        # dst has a decoy very close to src feature 0's nearest, breaking
        # mutual consistency for it.
        src_f = jnp.asarray(np.eye(4, 33, dtype=np.float32) * 3)
        dst_rows = np.eye(4, 33, dtype=np.float32) * 3
        dst_rows[0] = dst_rows[1] * 0.99  # dst 0 sits next to src 1's match
        idx, keep = robust_global.mutual_matches(
            src_f, jnp.asarray(dst_rows), jnp.ones(4, bool), jnp.ones(4, bool)
        )
        assert not bool(jnp.all(keep))


class TestRobustRegistration:
    def test_large_rotation_recovered(self):
        src = _scene(jax.random.PRNGKey(1))
        # 90-degree-scale motion: far outside local ICP's basin.
        T_true = se3.exp(jnp.array([0.5, -0.3, 0.2, 1.2, 0.8, -0.5], jnp.float32))
        dst = se3.transform_points(T_true, src)
        sf, df = _feats_from_identity(256, 0.01, jax.random.PRNGKey(2))
        res = robust_global.register_robust(
            cloud_mod.from_points(src), cloud_mod.from_points(dst), sf, df, 0.1
        )
        assert bool(res.valid)
        assert _twist_err(res.transform, T_true) < 1e-2

    def test_outlier_correspondences_rejected(self):
        key = jax.random.PRNGKey(3)
        src = _scene(key)
        T_true = se3.exp(jnp.array([0.3, 0.2, -0.4, 0.9, -0.6, 0.4], jnp.float32))
        dst = np.array(se3.transform_points(T_true, src))
        # Corrupt 30% of destination points -> gross outlier matches.
        rng = np.random.RandomState(0)
        bad = rng.choice(256, 77, replace=False)
        dst[bad] = rng.randn(77, 3) * 3
        sf, df = _feats_from_identity(256, 0.01, jax.random.PRNGKey(4))
        res = robust_global.register_robust(
            cloud_mod.from_points(src), cloud_mod.from_points(jnp.asarray(dst)), sf, df, 0.1
        )
        assert bool(res.valid)
        assert _twist_err(res.transform, T_true) < 5e-2

    def test_noise_tolerance(self):
        src = _scene(jax.random.PRNGKey(5))
        T_true = se3.exp(jnp.array([0.2, -0.1, 0.3, 0.7, 0.5, -0.3], jnp.float32))
        dst = se3.transform_points(T_true, src)
        dst = dst + 0.01 * jax.random.normal(jax.random.PRNGKey(6), dst.shape, dtype=jnp.float32)
        sf, df = _feats_from_identity(256, 0.01, jax.random.PRNGKey(7))
        res = robust_global.register_robust(
            cloud_mod.from_points(src), cloud_mod.from_points(dst), sf, df, 0.1
        )
        assert _twist_err(res.transform, T_true) < 5e-2

    def test_too_few_correspondences_invalid(self):
        src = _scene(jax.random.PRNGKey(8), n=8)
        dst = src
        sf = jnp.asarray(np.random.RandomState(1).rand(8, 33), jnp.float32)
        df = jnp.asarray(np.random.RandomState(2).rand(8, 33), jnp.float32)
        mask = jnp.zeros(8, bool).at[:2].set(True)
        res = robust_global.register_robust(
            cloud_mod.Cloud(src, mask), cloud_mod.Cloud(dst, mask), sf, df, 0.1
        )
        assert not bool(res.valid)
