"""Photometric alignment + differentiable sampling tests (the working
version of the reference's dead photometric/jet code, C20-C21)."""

import jax
import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.align import photometric
from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.ops.sampling import bilinear_sample, image_gradients

INTR = camera.Intrinsics(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)


def _textured_frame(T_wc, scene):
    """Render depth and derive a synthetic intensity image from geometry
    (view-independent world-position texture -> photometrically consistent
    across views)."""
    d = synthetic.render_depth(INTR, T_wc, scene)
    valid = camera.valid_mask(d)
    verts = camera.unproject_depth(jnp.where(valid, d, 0.0), INTR)
    R, t = se3.rotation(T_wc), se3.translation(T_wc)
    world = verts @ R.T + t
    gray = 0.5 + 0.25 * jnp.sin(4.0 * world[..., 0]) * jnp.cos(4.0 * world[..., 1]) \
        + 0.15 * jnp.sin(3.0 * world[..., 2])
    return d, jnp.where(valid, gray, 0.0)


class TestBilinearSample:
    def test_exact_at_integer_coords(self):
        img = jnp.asarray(np.random.RandomState(0).rand(16, 20).astype(np.float32))
        u = jnp.array([3.0, 10.0])
        v = jnp.array([5.0, 7.0])
        vals, ok = bilinear_sample(img, u, v)
        np.testing.assert_allclose(np.asarray(vals), [img[5, 3], img[7, 10]], rtol=1e-6)
        assert bool(jnp.all(ok))

    def test_interpolates_linearly(self):
        img = jnp.arange(12.0, dtype=jnp.float32).reshape(3, 4)
        vals, _ = bilinear_sample(img, jnp.array([1.5]), jnp.array([1.0]))
        assert float(vals[0]) == 5.5

    def test_out_of_bounds_flagged(self):
        img = jnp.ones((4, 4), jnp.float32)
        _, ok = bilinear_sample(img, jnp.array([-1.0, 5.0]), jnp.array([0.0, 0.0]))
        assert not bool(ok[0]) and not bool(ok[1])

    def test_differentiable(self):
        img = jnp.asarray(np.random.RandomState(1).rand(8, 8).astype(np.float32))
        g = jax.grad(lambda u: bilinear_sample(img, u, jnp.array([3.2]))[0].sum())(
            jnp.array([2.3])
        )
        assert np.isfinite(np.asarray(g)).all()
        # Gradient matches the finite-difference of the sampled value.
        eps = 1e-3
        f = lambda u: float(bilinear_sample(img, jnp.array([u]), jnp.array([3.2]))[0][0])
        fd = (f(2.3 + eps) - f(2.3 - eps)) / (2 * eps)
        assert abs(float(g[0]) - fd) < 1e-2

    def test_image_gradients_of_ramp(self):
        img = jnp.arange(10.0, dtype=jnp.float32)[None, :].repeat(6, 0)
        gx, gy = image_gradients(img)
        np.testing.assert_allclose(np.asarray(gx[:, 1:-1]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy), 0.0, atol=1e-6)


class TestPhotometricAlignment:
    def test_recovers_small_motion_planar_scene(self):
        # Edge-free scene (textured wall + floor): photometric-only
        # alignment is well-conditioned and converges tightly.
        scene = synthetic.Scene(
            sphere_centers=jnp.full((1, 3), 100.0), sphere_radii=jnp.full((1,), 0.01),
            floor_y=1.2, wall_z=4.0,
        )
        tw = jnp.array([0.01, -0.008, 0.012, 0.008, -0.006, 0.008], jnp.float32)
        T_rel = se3.exp(tw)
        d0, g0 = _textured_frame(se3.identity(), scene)
        d1, g1 = _textured_frame(T_rel, scene)
        pts, inten, ok = photometric.sample_intensity_points(d1, g1, INTR, 2048)
        res = photometric.align_photometric(
            pts.astype(jnp.float32), inten.astype(jnp.float32), ok,
            g0.astype(jnp.float32), INTR,
            cfg=photometric.PhotometricConfig(iters=30, huber_delta=0.1),
        )
        err = np.abs(np.asarray(se3.log(se3.compose(se3.inverse(T_rel), res.transform))))
        assert err.max() < 5e-3
        assert float(res.rmse) < 0.01

    def test_improves_on_cluttered_scene(self):
        # With depth edges (spheres), bilinear mixing biases photometric-only
        # alignment: require improvement over identity, not tight recovery.
        scene = synthetic.default_scene(seed=7)
        tw = jnp.array([0.01, -0.008, 0.012, 0.008, -0.006, 0.008], jnp.float32)
        T_rel = se3.exp(tw)
        d0, g0 = _textured_frame(se3.identity(), scene)
        d1, g1 = _textured_frame(T_rel, scene)
        pts, inten, ok = photometric.sample_intensity_points(d1, g1, INTR, 2048)
        pts = pts.astype(jnp.float32)
        inten = inten.astype(jnp.float32)
        g0 = g0.astype(jnp.float32)
        r0, ok0 = photometric.photometric_residuals(se3.identity(), pts, inten, g0, INTR)
        m0 = (ok0 & ok).astype(jnp.float32)
        rms_before = float(jnp.sqrt(jnp.sum(r0 * r0 * m0) / jnp.sum(m0)))
        res = photometric.align_photometric(
            pts, inten, ok, g0, INTR,
            cfg=photometric.PhotometricConfig(iters=20, huber_delta=0.2),
        )
        assert float(res.rmse) < 0.6 * rms_before

    def test_identity_stays_identity(self):
        scene = synthetic.default_scene(seed=8)
        d0, g0 = _textured_frame(se3.identity(), scene)
        pts, inten, ok = photometric.sample_intensity_points(d0, g0, INTR, 1024)
        res = photometric.align_photometric(pts, inten, ok, g0, INTR)
        err = np.abs(np.asarray(se3.log(res.transform)))
        assert err.max() < 1e-3


class TestBilinearIntegerImages:
    def test_uint8_image_keeps_fractional_weights(self):
        """Integer images must not truncate the bilinear weights (the old
        image-dtype cast made 'bilinear' a nearest-floor lookup with zero
        gradients)."""
        import numpy as np

        from realsensetracker_tpu.ops.sampling import bilinear_sample

        img8 = np.array([[0, 100], [0, 100]], np.uint8)
        vals, inb = bilinear_sample(jnp.asarray(img8),
                                    jnp.asarray([0.5]), jnp.asarray([0.0]))
        assert bool(inb[0])
        assert abs(float(vals[0]) - 50.0) < 1e-4  # mid-pixel interpolation
