"""Multi-device tests on the 8-way virtual CPU mesh (BASELINE configs 4-5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realsensetracker_tpu.align import projective
from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.parallel import batched, mesh as mesh_mod, sharded

INTR = camera.Intrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)
CFG = projective.ProjectiveIcpConfig(iters=(6, 6, 8), samples=1024)


def _make_batch(bsz):
    keys = jax.random.split(jax.random.PRNGKey(0), bsz)
    twists = 0.02 * jax.random.normal(jax.random.PRNGKey(1), (bsz, 6), dtype=jnp.float32)
    srcs, dsts, trues = [], [], []
    for i in range(bsz):
        scene = synthetic.default_scene(seed=i)
        d0, d1, T = synthetic.render_pair(INTR, twists[i], scene)
        srcs.append(d1)
        dsts.append(d0)
        trues.append(T)
    del keys
    return jnp.stack(srcs), jnp.stack(dsts), jnp.stack(trues)


def _max_twist_err(T_est, T_true):
    delta = se3.compose(se3.inverse(T_true), T_est)
    return float(np.abs(np.asarray(se3.log(delta))).max())


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_register_batch_vmap():
    src, dst, true = _make_batch(4)
    res = batched.register_batch(src, dst, INTR, CFG)
    assert res.transform.shape == (4, 4, 4)
    for i in range(4):
        assert _max_twist_err(res.transform[i], true[i]) < 1e-2


def test_register_batch_matches_single():
    src, dst, _ = _make_batch(2)
    res_b = batched.register_batch(src, dst, INTR, CFG)
    res_0 = projective.register_depth_pair(src[0], dst[0], INTR, CFG)
    np.testing.assert_allclose(
        np.asarray(res_b.transform[0]), np.asarray(res_0.transform), atol=1e-5
    )


def test_register_batch_chunked_matches_plain():
    """Chunked scan (one dispatch, many chunks) must equal plain vmap."""
    src, dst, _ = _make_batch(8)
    plain = batched.register_batch(src, dst, INTR, CFG)
    chunked = batched.register_batch_chunked(src, dst, INTR, CFG, chunk=4)
    np.testing.assert_allclose(
        np.asarray(chunked.transform), np.asarray(plain.transform), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(chunked.rmse), np.asarray(plain.rmse), atol=1e-5
    )
    # B <= chunk falls through to the plain path.
    small = batched.register_batch_chunked(src[:2], dst[:2], INTR, CFG, chunk=4)
    np.testing.assert_allclose(
        np.asarray(small.transform), np.asarray(plain.transform[:2]), atol=1e-5
    )


def test_inner_iters_pose_recovery():
    """The outer/inner split (gather once, 2 GN updates) recovers poses to
    the same tolerance as re-associate-every-step."""
    cfg = projective.ProjectiveIcpConfig(iters=(3, 3, 4), inner_iters=2, samples=1024)
    src, dst, true = _make_batch(3)
    res = batched.register_batch(src, dst, INTR, cfg)
    for i in range(3):
        assert _max_twist_err(res.transform[i], true[i]) < 1e-2


def test_point_sharded_matches_unsharded_inner_iters():
    """Sharded GN with inner iterations must match the unsharded result."""
    cfg = projective.ProjectiveIcpConfig(iters=(3, 3, 4), inner_iters=2, samples=1024)
    mesh = mesh_mod.make_mesh(8, point_parallelism=4)
    src, dst, _ = _make_batch(2)
    T_sh, rmse_sh = sharded.register_batch_point_sharded(mesh, src, dst, INTR, cfg)
    res = batched.register_batch(src, dst, INTR, cfg)
    np.testing.assert_allclose(np.asarray(T_sh), np.asarray(res.transform), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rmse_sh), np.asarray(res.rmse), atol=1e-4)


def test_register_batch_sharded_data_parallel():
    mesh = mesh_mod.make_mesh(8)
    src, dst, true = _make_batch(8)
    res = batched.register_batch_sharded(mesh, src, dst, INTR, CFG)
    assert res.transform.shape == (8, 4, 4)
    for i in range(8):
        assert _max_twist_err(res.transform[i], true[i]) < 1e-2


def test_point_sharded_matches_unsharded():
    """psum-reduced normal equations must reproduce the single-device result."""
    mesh = mesh_mod.make_mesh(8, point_parallelism=4)
    assert mesh.shape == {"data": 2, "point": 4}
    src, dst, _ = _make_batch(2)
    T_sh, rmse_sh = sharded.register_batch_point_sharded(mesh, src, dst, INTR, CFG)
    res = batched.register_batch(src, dst, INTR, CFG)
    np.testing.assert_allclose(np.asarray(T_sh), np.asarray(res.transform), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rmse_sh), np.asarray(res.rmse), atol=1e-4)


@pytest.mark.parametrize("pp", [1, 2, 8])
def test_mesh_shapes(pp):
    mesh = mesh_mod.make_mesh(8, point_parallelism=pp)
    assert mesh.shape["data"] * mesh.shape["point"] == 8


def test_multihost_helpers_single_process():
    from realsensetracker_tpu.parallel import multihost

    sl = multihost.process_stream_slice(8)
    assert sl == slice(0, 8)
    mesh = mesh_mod.make_mesh(8)
    frames = np.zeros((8, 12, 16), np.float32)
    arr = multihost.global_frame_batch(frames, mesh)
    assert arr.shape == (8, 12, 16)
    multihost.all_processes_ready()  # no-op single process
