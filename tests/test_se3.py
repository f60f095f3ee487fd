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


def test_orthonormalize_fixes_feedback_amplification():
    """The inverse-compose feedback loop (tracking warm starts) multiplies
    R-denormalization ~3x per cycle; orthonormalize must hold it flat."""
    T = np.asarray(se3.exp(jnp.array([0.1, -0.2, 0.05, 0.2, 0.1, -0.1], jnp.float32)))
    # Seed a small column-scale error.
    T = T.copy()
    T[:3, 0] *= 1.0 + 1e-4
    X = jnp.asarray(T, jnp.float32)
    for _ in range(12):
        # One feedback cycle: init = inv(X) @ X then X = X @ init (the
        # unstable pattern); project afterwards.
        init = se3.compose(se3.inverse(X), X)
        X = se3.orthonormalize(se3.compose(X, init))
    R = np.asarray(X)[:3, :3]
    assert np.abs(R.T @ R - np.eye(3)).max() < 1e-5

    # Without the projection, the same loop amplifies the seed error.
    Y = jnp.asarray(T, jnp.float32)
    for _ in range(12):
        init = se3.compose(se3.inverse(Y), Y)
        Y = se3.compose(Y, init)
    Ry = np.asarray(Y)[:3, :3]
    assert np.abs(Ry.T @ Ry - np.eye(3)).max() > 1e-2


def test_accumulate_matches_compose_then_project():
    A = se3.exp(jnp.array([0.1, 0.0, -0.2, 0.3, -0.1, 0.2], jnp.float32))
    B = se3.exp(jnp.array([-0.05, 0.1, 0.0, -0.2, 0.15, 0.1], jnp.float32))
    got = np.asarray(se3.accumulate(A, B))
    want = np.asarray(se3.orthonormalize(se3.compose(A, B)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_orthonormalize_batched():
    Ts = jnp.stack([
        se3.exp(jnp.array([0.1 * i, 0, 0.05, 0.1, -0.05 * i, 0], jnp.float32))
        for i in range(4)
    ])
    out = np.asarray(se3.orthonormalize(Ts))
    for k in range(4):
        R = out[k, :3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(out[k], np.asarray(Ts[k]), atol=1e-5)


def test_transform_points_t_matches_pointmajor():
    T = se3.exp(jnp.array([0.2, -0.1, 0.3, 0.4, 0.2, -0.3], jnp.float32))
    pts = jax.random.normal(jax.random.PRNGKey(9), (17, 3), dtype=jnp.float32)
    a = np.asarray(se3.transform_points(T, pts))
    b = np.asarray(se3.transform_points_t(T, pts.T)).T
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_orthogonalize_projects_to_so3():
    M = jnp.eye(3) + 0.1 * jax.random.normal(jax.random.PRNGKey(5), (3, 3))
    R = se3.orthogonalize(M)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
    assert float(jnp.linalg.det(R)) == pytest.approx(1.0, abs=1e-5)
