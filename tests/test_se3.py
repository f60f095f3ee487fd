import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realsensetracker_tpu.geometry import se3


def random_twists(key, n, scale=1.0):
    return scale * jax.random.normal(key, (n, 6), dtype=jnp.float32)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    tw = random_twists(key, 64, scale=0.8)
    T = se3.exp(tw)
    tw2 = se3.log(T)
    np.testing.assert_allclose(np.asarray(tw2), np.asarray(tw), atol=1e-4)


def test_exp_small_angle_stable():
    tw = jnp.array([[1e-9, 0, 0, 0, 1e-10, 0], [0.0] * 6], dtype=jnp.float32)
    T = se3.exp(tw)
    assert np.all(np.isfinite(np.asarray(T)))
    np.testing.assert_allclose(np.asarray(T[1]), np.eye(4), atol=1e-6)


def test_rotation_is_orthonormal():
    T = se3.exp(random_twists(jax.random.PRNGKey(1), 32))
    R = se3.rotation(T)
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_compose_inverse():
    key = jax.random.PRNGKey(2)
    Ta = se3.exp(random_twists(key, 16))
    Tb = se3.inverse(Ta)
    np.testing.assert_allclose(
        np.asarray(se3.compose(Ta, Tb)), np.tile(np.eye(4), (16, 1, 1)), atol=1e-5
    )


def test_transform_points_matches_matrix():
    key = jax.random.PRNGKey(3)
    T = se3.exp(random_twists(key, 1))[0]
    pts = jax.random.normal(jax.random.PRNGKey(4), (100, 3), dtype=jnp.float32)
    out = se3.transform_points(T, pts)
    hom = jnp.concatenate([pts, jnp.ones((100, 1))], axis=-1)
    expected = (hom @ np.asarray(T).T)[:, :3]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_quaternion_roundtrip(seed):
    T = se3.exp(random_twists(jax.random.PRNGKey(seed), 16, scale=2.0))
    R = se3.rotation(T)
    q = se3.quaternion_from_matrix(R)
    R2 = se3.matrix_from_quaternion(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_log_so3_small_angle():
    R = se3.exp_so3(jnp.array([[1e-6, -2e-6, 5e-7]], dtype=jnp.float32))
    w = se3.log_so3(R)
    np.testing.assert_allclose(
        np.asarray(w), [[1e-6, -2e-6, 5e-7]], atol=1e-8
    )


def test_orthogonalize_projects_to_so3():
    M = jnp.eye(3) + 0.1 * jax.random.normal(jax.random.PRNGKey(5), (3, 3))
    R = se3.orthogonalize(M)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
    assert float(jnp.linalg.det(R)) == pytest.approx(1.0, abs=1e-5)
