"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.kernels import level_kernel
from realsensetracker_tpu.ops import pyramid

INTR = camera.Intrinsics(fx=100.0, fy=100.0, cx=63.5, cy=31.5, width=128, height=64)


def _depth():
    d = synthetic.render_depth(INTR, jnp.eye(4), synthetic.default_scene(seed=3))
    # Punch some invalid holes to exercise validity propagation.
    d = d.at[10:14, 20:30].set(0.0)
    return d


class TestLevelKernel:
    def test_matches_xla_reference(self):
        d = _depth()
        levels, _ = pyramid.build_pyramid(d, INTR, num_levels=1)
        ref = np.asarray(levels[0].packed)
        got = np.asarray(
            level_kernel.build_level_packed(d, INTR, tile_h=16, interpret=True)
        )
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_normals_unit_or_zero(self):
        d = _depth()
        got = np.asarray(
            level_kernel.build_level_packed(d, INTR, tile_h=16, interpret=True)
        )
        norm2 = (got[0:3] ** 2).sum(0)
        assert np.all((np.abs(norm2 - 1.0) < 1e-4) | (norm2 < 1e-8))

    def test_borders_invalid(self):
        d = _depth()
        got = np.asarray(
            level_kernel.build_level_packed(d, INTR, tile_h=16, interpret=True)
        )
        norm2 = (got[0:3] ** 2).sum(0)
        assert norm2[0].max() == 0.0 and norm2[-1].max() == 0.0
        assert norm2[:, 0].max() == 0.0 and norm2[:, -1].max() == 0.0

    def test_odd_tile_fallback(self):
        intr = camera.Intrinsics(fx=50.0, fy=50.0, cx=63.5, cy=17.5, width=128, height=36)
        d = synthetic.render_depth(intr, jnp.eye(4), synthetic.default_scene(seed=4))
        levels, _ = pyramid.build_pyramid(d, intr, num_levels=1)
        got = np.asarray(
            level_kernel.build_level_packed(d, intr, tile_h=16, interpret=True)
        )
        np.testing.assert_allclose(got, np.asarray(levels[0].packed), atol=2e-5)

    def test_odd_height_pads_instead_of_whole_image(self):
        """Heights with no multiple-of-8 divisor and > one-block size (482 =
        2 * 241) used to fall back to a whole-image block that overflows
        VMEM on hardware; the pad plan must keep parity with the XLA path."""
        h = 482
        tile, padded = level_kernel._tile_plan(h, 240)
        assert padded > h and padded % tile == 0 and tile % 8 == 0
        assert tile <= 240

        intr = camera.Intrinsics(fx=60.0, fy=60.0, cx=31.5, cy=(h - 1) / 2,
                                 width=64, height=h)
        d = synthetic.render_depth(intr, jnp.eye(4),
                                   synthetic.default_scene(seed=5))
        levels, _ = pyramid.build_pyramid(d, intr, num_levels=1)
        got = np.asarray(
            level_kernel.build_level_packed(d, intr, tile_h=240, interpret=True)
        )
        assert got.shape == (4, h, 64)
        np.testing.assert_allclose(got, np.asarray(levels[0].packed), atol=2e-5)


class TestBatchedLevelKernels:
    """Batched-grid variants (VERDICT r2 #3): grid=(B, bands) and the
    2-pass boundary-row-sideband kernel must match the per-image kernel."""

    def _batch(self, n=3):
        ds = []
        for s in range(n):
            d = synthetic.render_depth(
                INTR, jnp.eye(4), synthetic.default_scene(seed=s)
            )
            d = d.at[8 + s : 12 + s, 20:30].set(0.0)
            ds.append(d)
        return jnp.stack(ds)

    def test_explicit_grid_matches_per_image(self):
        depths = self._batch()
        ref = np.stack([
            np.asarray(
                level_kernel.build_level_packed(d, INTR, tile_h=16, interpret=True)
            )
            for d in depths
        ])
        got = np.asarray(
            level_kernel.build_level_packed_batched(
                depths, INTR, tile_h=16, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_rows_variant_matches_per_image(self):
        depths = self._batch()
        ref = np.stack([
            np.asarray(
                level_kernel.build_level_packed(d, INTR, tile_h=16, interpret=True)
            )
            for d in depths
        ])
        got = np.asarray(
            level_kernel.build_level_packed_rows(
                depths, INTR, tile_h=16, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_rows_variant_single_band(self):
        # Whole image as one band: boundary rows clamp to the image edge.
        depths = self._batch(2)
        ref = np.asarray(
            level_kernel.build_level_packed_batched(
                depths, INTR, tile_h=64, interpret=True
            )
        )
        got = np.asarray(
            level_kernel.build_level_packed_rows(
                depths, INTR, tile_h=64, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, atol=1e-6)
