"""Voxel downsample + world-model accumulator vs the hash-map reference."""

import jax
import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.geometry import se3
from realsensetracker_tpu.ops import cloud as cloud_mod
from realsensetracker_tpu.ops import voxel
from realsensetracker_tpu.tracking import accumulator as acc_mod

from tests import reference_impl as ref


def _random_points(key, n, scale=1.0):
    return scale * jax.random.normal(key, (n, 3), dtype=jnp.float32)


class TestDownsampleVoxel:
    def test_selects_same_points_as_reference(self):
        pts = np.asarray(_random_points(jax.random.PRNGKey(0), 500, scale=0.5))
        ref_idx = set(ref.downsample_voxel_np(pts, 0.1))
        c = cloud_mod.from_points(jnp.asarray(pts))
        idx, mask = voxel.voxel_select_indices(c, 0.1)
        got = set(np.asarray(idx)[np.asarray(mask)].tolist())
        assert got == ref_idx

    def test_far_from_origin_cloud_not_collapsed(self):
        """Per-cloud key recentering: a scene 8 m from the origin at 1 cm
        voxels used to clamp wholesale into the +-511-voxel packed range
        (everything shared a boundary key and was discarded). Selection
        must still match the unbounded hash-map oracle."""
        pts = np.asarray(
            _random_points(jax.random.PRNGKey(5), 400, scale=0.5)
        ) + np.asarray([8.0, -8.0, 8.0], np.float32)
        ref_idx = set(ref.downsample_voxel_np(pts, 0.01))
        assert len(ref_idx) > 300  # far cloud, fine voxels: many survivors
        c = cloud_mod.from_points(jnp.asarray(pts))
        idx, mask = voxel.voxel_select_indices(c, 0.01)
        got = set(np.asarray(idx)[np.asarray(mask)].tolist())
        assert got == ref_idx

    def test_first_point_wins(self):
        pts = jnp.array(
            [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [0.5, 0.5, 0.5]], jnp.float32
        )
        idx, mask = voxel.voxel_select_indices(cloud_mod.from_points(pts), 0.1)
        kept = set(np.asarray(idx)[np.asarray(mask)].tolist())
        assert kept == {0, 2}  # index 1 shares index-0's voxel and loses

    def test_masked_points_ignored(self):
        pts = jnp.array([[0.0, 0, 0], [1.0, 0, 0]], jnp.float32)
        c = cloud_mod.Cloud(pts, jnp.array([False, True]))
        out = voxel.downsample_voxel(c, 0.1)
        assert int(out.count()) == 1
        np.testing.assert_allclose(np.asarray(out.points[0]), [1.0, 0, 0])

    def test_all_unique_full_capacity(self):
        pts = jnp.asarray(np.arange(30, dtype=np.float32).reshape(10, 3))
        out = voxel.downsample_voxel(cloud_mod.from_points(pts), 0.05)
        assert int(out.count()) == 10
        got = set(map(tuple, np.asarray(out.points).tolist()))
        assert got == set(map(tuple, np.asarray(pts).tolist()))

    def test_trunc_mode_differs_from_floor(self):
        # -0.01 and +0.01 share voxel 0 under truncation, differ under floor.
        pts = jnp.array([[-0.01, 0, 0], [0.01, 0, 0]], jnp.float32)
        c = cloud_mod.from_points(pts)
        n_floor = int(voxel.downsample_voxel(c, 0.1, mode="floor").count())
        n_trunc = int(voxel.downsample_voxel(c, 0.1, mode="trunc").count())
        assert n_floor == 2 and n_trunc == 1


class TestMapAccumulator:
    def test_insert_and_extract(self):
        acc = acc_mod.init_map(64)
        pts = _random_points(jax.random.PRNGKey(1), 20, scale=2.0)
        acc = acc_mod.add_cloud(acc, se3.identity(), cloud_mod.from_points(pts), 0.05)
        assert int(acc.count()) == 20

    def test_existing_entries_win(self):
        acc = acc_mod.init_map(16)
        p1 = jnp.array([[0.01, 0.01, 0.01]], jnp.float32)
        p2 = jnp.array([[0.03, 0.03, 0.03]], jnp.float32)  # same voxel (trunc 0.05)
        acc = acc_mod.add_cloud(acc, se3.identity(), cloud_mod.from_points(p1), 0.05)
        acc = acc_mod.add_cloud(acc, se3.identity(), cloud_mod.from_points(p2), 0.05)
        assert int(acc.count()) == 1
        kept = np.asarray(acc.points)[np.asarray(acc.mask)]
        np.testing.assert_allclose(kept, np.asarray(p1), atol=1e-7)

    def test_transform_applied(self):
        acc = acc_mod.init_map(8)
        T = se3.from_rt(jnp.eye(3), jnp.array([1.0, 0, 0]))
        p = jnp.array([[0.2, 0.2, 0.2]], jnp.float32)
        acc = acc_mod.add_cloud(acc, T, cloud_mod.from_points(p), 0.05)
        kept = np.asarray(acc.points)[np.asarray(acc.mask)]
        np.testing.assert_allclose(kept, [[1.2, 0.2, 0.2]], atol=1e-6)

    def test_capacity_respected(self):
        acc = acc_mod.init_map(8)
        pts = _random_points(jax.random.PRNGKey(2), 32, scale=5.0)
        acc = acc_mod.add_cloud(acc, se3.identity(), cloud_mod.from_points(pts), 0.05)
        assert int(acc.count()) <= 8
        assert acc.points.shape == (8, 3)

    def test_matches_reference_dedupe_across_clouds(self):
        # Two overlapping clouds; survivor set must equal the reference
        # hash-map contents (keyed by truncated voxel coords).
        rng = np.random.RandomState(3)
        a = rng.rand(40, 3).astype(np.float32)
        b = rng.rand(40, 3).astype(np.float32)
        acc = acc_mod.init_map(128)
        acc = acc_mod.add_cloud(acc, se3.identity(), cloud_mod.from_points(jnp.asarray(a)), 0.1)
        acc = acc_mod.add_cloud(acc, se3.identity(), cloud_mod.from_points(jnp.asarray(b)), 0.1)
        ref_map = {}
        for p in np.concatenate([a, b]):
            key = tuple((p / 0.1).astype(np.int32))
            ref_map.setdefault(key, p)
        got = np.asarray(acc.points)[np.asarray(acc.mask)]
        expect = np.stack(list(ref_map.values()))
        got_set = set(map(tuple, np.round(got, 5).tolist()))
        expect_set = set(map(tuple, np.round(expect, 5).tolist()))
        assert got_set == expect_set
