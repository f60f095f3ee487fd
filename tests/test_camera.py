import jax
import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.geometry import camera


INTR = camera.Intrinsics(fx=100.0, fy=110.0, cx=31.5, cy=23.5, width=64, height=48)


def test_unproject_project_roundtrip():
    key = jax.random.PRNGKey(0)
    depth = 1.0 + jax.random.uniform(key, (48, 64), dtype=jnp.float32)
    verts = camera.unproject_depth(depth, INTR)
    u, v, z = camera.project(verts, INTR)
    uu, vv = jnp.meshgrid(jnp.arange(64.0), jnp.arange(48.0))
    np.testing.assert_allclose(np.asarray(u), np.asarray(uu), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(vv), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), atol=1e-6)


def test_invalid_depth_masked():
    depth = jnp.array([[1.0, 0.0], [-1.0, jnp.nan]], dtype=jnp.float32)
    intr = camera.Intrinsics(1.0, 1.0, 0.5, 0.5, 2, 2)
    verts = camera.unproject_depth(depth, intr)
    assert np.all(np.isfinite(np.asarray(verts)))
    mask = camera.valid_mask(depth)
    np.testing.assert_array_equal(np.asarray(mask), [[True, False], [False, False]])


def test_scaled_intrinsics_consistent():
    half = INTR.scaled(0.5)
    assert half.width == 32 and half.height == 24
    # A 3-D point projects to half the pixel coordinate (pixel-center model).
    p = jnp.array([[0.3, -0.2, 2.0]])
    u0, v0, _ = camera.project(p, INTR)
    u1, v1, _ = camera.project(p, half)
    np.testing.assert_allclose(np.asarray(u1), (np.asarray(u0) + 0.5) / 2 - 0.5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), (np.asarray(v0) + 0.5) / 2 - 0.5, atol=1e-5)


def test_in_bounds():
    u = jnp.array([0.0, -0.1, 63.0, 63.1])
    v = jnp.array([0.0, 5.0, 47.0, 5.0])
    np.testing.assert_array_equal(
        np.asarray(camera.in_bounds(u, v, INTR)), [True, False, True, False]
    )
