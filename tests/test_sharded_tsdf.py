"""Sharded dense mapping (mapping/sharded.py) on the 8-device CPU mesh:
x-slab volume layout, communication-free integrate, all-gather raycast.
Parity oracle: the unsharded mapping/tsdf.py path on identical inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.mapping import sharded as sh
from realsensetracker_tpu.mapping import tsdf
from realsensetracker_tpu.parallel.mesh import make_mesh

W, H = 80, 60
INTR = camera.Intrinsics(
    fx=64.0, fy=64.0, cx=(W - 1) / 2, cy=(H - 1) / 2, width=W, height=H
)
CFG = tsdf.TsdfConfig(
    resolution=64, voxel_size=0.1, origin=(-3.2, -2.4, -0.3),
    trunc=0.3, max_range=5.0,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh(8)


@pytest.fixture(scope="module")
def frames():
    scene = synthetic.default_scene(seed=3)
    depths, poses = synthetic.render_trajectory(
        INTR, 4, scene=scene, seed=1, step_scale=0.01
    )
    return depths, poses


class TestShardedVolume:
    def test_layout(self, mesh):
        vol = sh.init_volume_sharded(CFG, mesh)
        assert vol.tsdf.sharding.spec == jax.sharding.PartitionSpec(
            "data", None, None
        )
        # 64 planes over 8 devices: 8-plane slabs, one per device.
        assert len(vol.tsdf.sharding.device_set) == 8

    def test_indivisible_resolution_rejected(self, mesh):
        bad = tsdf.init_volume(CFG._replace(resolution=60))
        with pytest.raises(ValueError, match="divisible"):
            sh.shard_volume(bad, mesh)

    def test_integrate_parity_and_layout_stability(self, mesh, frames):
        depths, poses = frames
        ref = tsdf.init_volume(CFG)
        vol = sh.init_volume_sharded(CFG, mesh)
        for i in range(len(depths)):
            ref = tsdf.integrate(ref, depths[i], poses[i], INTR, CFG)
            vol = sh.integrate(vol, depths[i], poses[i], INTR, CFG)
            # The update is elementwise per voxel: the slab layout must
            # survive every frame (no creeping replication).
            assert vol.tsdf.sharding.spec == jax.sharding.PartitionSpec(
                "data", None, None
            )
        np.testing.assert_allclose(
            np.asarray(vol.tsdf), np.asarray(ref.tsdf), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(vol.weight), np.asarray(ref.weight), atol=1e-6
        )

    def test_raycast_parity(self, mesh, frames):
        depths, poses = frames
        ref = tsdf.init_volume(CFG)
        vol = sh.init_volume_sharded(CFG, mesh)
        for i in range(3):
            ref = tsdf.integrate(ref, depths[i], poses[i], INTR, CFG)
            vol = sh.integrate(vol, depths[i], poses[i], INTR, CFG)
        d_ref = np.asarray(tsdf.raycast(ref, poses[0], INTR, CFG))
        d_sh = np.asarray(sh.raycast(vol, poses[0], INTR, CFG))
        np.testing.assert_allclose(d_sh, d_ref, atol=1e-5)
        assert (d_ref > 0).mean() > 0.3  # the render actually hit surface

    def test_colored_volume_shards(self, mesh, frames):
        depths, poses = frames
        color = jnp.full((H, W, 3), 0.4, jnp.float32)
        ref = tsdf.init_volume(CFG, with_color=True)
        vol = sh.init_volume_sharded(CFG, mesh, with_color=True)
        ref = tsdf.integrate(ref, depths[0], poses[0], INTR, CFG, color=color)
        vol = sh.integrate(vol, depths[0], poses[0], INTR, CFG, color=color)
        np.testing.assert_allclose(
            np.asarray(vol.color), np.asarray(ref.color), atol=1e-6
        )

    def test_mesh_extraction_from_sharded(self, mesh, frames):
        """extract_mesh runs unmodified on a sharded volume (SPMD
        partitions the dense sweeps; the compaction gathers)."""
        from realsensetracker_tpu.mapping import mesh as mesh_mod

        depths, poses = frames
        ref = tsdf.init_volume(CFG)
        vol = sh.init_volume_sharded(CFG, mesh)
        ref = tsdf.integrate(ref, depths[0], poses[0], INTR, CFG)
        vol = sh.integrate(vol, depths[0], poses[0], INTR, CFG)
        m_ref = mesh_mod.extract_mesh(ref, CFG, capacity=16384)
        m_sh = mesh_mod.extract_mesh(vol, CFG, capacity=16384)
        assert int(m_sh.count()) == int(m_ref.count()) > 500
        np.testing.assert_allclose(
            np.asarray(m_sh.vertices)[np.asarray(m_sh.mask)],
            np.asarray(m_ref.vertices)[np.asarray(m_ref.mask)],
            atol=1e-5,
        )

    def test_tracker_step_on_sharded_volume(self, mesh, frames):
        """The fused raycast->register->integrate step runs SPMD when the
        carried volume is sharded, with per-frame results identical to
        the single-device tracker."""
        from realsensetracker_tpu.align.projective import ProjectiveIcpConfig
        from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

        depths, _ = frames
        icp = ProjectiveIcpConfig(
            iters=(3, 3), inner_iters=2, samples=768, min_samples=192
        )
        a = TsdfTracker(INTR, volume=CFG, icp=icp)
        b = TsdfTracker(INTR, volume=CFG, icp=icp)
        for i in range(2):
            a.process(np.asarray(depths[i]), float(i))
            b.process(np.asarray(depths[i]), float(i))
        b._vol = sh.shard_volume(b._vol, mesh)  # reshard mid-stream
        for i in range(2, 4):
            ra = a.process(np.asarray(depths[i]), float(i))
            rb = b.process(np.asarray(depths[i]), float(i))
            assert ra.success and rb.success
            np.testing.assert_allclose(ra.pose, rb.pose, atol=1e-5)
