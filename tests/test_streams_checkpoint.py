"""Multi-stream batched tracking (config 5) + checkpoint/resume tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.align import projective
from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.parallel import streams
from realsensetracker_tpu.tracking import checkpoint
from realsensetracker_tpu.tracking.frame_to_frame import FrameToFrameTracker

INTR = camera.Intrinsics(fx=100.0, fy=100.0, cx=49.5, cy=37.0, width=100, height=75)
CFG = projective.ProjectiveIcpConfig(iters=(5, 5, 6), samples=1024)


def _stream_data(s=4, frames=4):
    """S independent trajectories through different scenes."""
    all_depths, all_poses = [], []
    for i in range(s):
        scene = synthetic.default_scene(seed=10 + i)
        d, p = synthetic.render_trajectory(INTR, frames, scene=scene, seed=i, step_scale=0.015)
        all_depths.append(d)
        all_poses.append(p)
    return jnp.stack(all_depths, 1), jnp.stack(all_poses, 1)  # (F, S, H, W), (F, S, 4, 4)


class TestMultiStream:
    def test_windowed_step_matches_sequential(self):
        depths, _ = _stream_data(s=3, frames=5)
        ref = streams.init_streams(depths[0], INTR, CFG)
        win = streams.init_streams(depths[0], INTR, CFG)
        seq_res = []
        for f in range(1, 5):
            ref, r = streams.step_streams(ref, depths[f], INTR, CFG)
            seq_res.append(r)
        # (S, W, H, Wd) window of the same 4 frames, one dispatch.
        window = jnp.moveaxis(depths[1:5], 0, 1)
        win, wr = streams.step_streams_window(win, window, INTR, CFG)
        np.testing.assert_allclose(
            np.asarray(ref.poses), np.asarray(win.poses), atol=1e-5
        )
        for f in range(4):
            assert bool(jnp.all(wr.success[:, f] == seq_res[f].success))
            np.testing.assert_allclose(
                np.asarray(wr.poses[:, f]), np.asarray(seq_res[f].poses),
                atol=1e-5,
            )

    def test_streams_track_independently(self):
        depths, poses = _stream_data(s=4, frames=4)
        state = streams.init_streams(depths[0], INTR, CFG)
        for f in range(1, 4):
            state, res = streams.step_streams(state, depths[f], INTR, CFG)
            assert bool(jnp.all(res.success))
        for i in range(4):
            err = np.abs(np.asarray(se3.log(
                se3.compose(se3.inverse(poses[3, i]), state.poses[i])))).max()
            assert err < 0.05

    def test_failed_stream_holds_pose_and_reference(self):
        depths, _ = _stream_data(s=2, frames=3)
        state = streams.init_streams(depths[0], INTR, CFG)
        # Kill stream 0's second frame.
        bad = depths[1].at[0].set(0.0)
        state1, res = streams.step_streams(state, bad, INTR, CFG)
        assert not bool(res.success[0])
        assert bool(res.success[1])
        np.testing.assert_array_equal(
            np.asarray(state1.poses[0]), np.eye(4, dtype=np.float32)
        )
        # Stream 0's reference must still be frame 0: the next good frame
        # registers against it successfully.
        state2, res2 = streams.step_streams(state1, depths[1], INTR, CFG)
        assert bool(res2.success[0])

    def test_sharded_streams_on_mesh(self):
        from realsensetracker_tpu.parallel import mesh as mesh_mod

        mesh = mesh_mod.make_mesh(8)
        depths, _ = _stream_data(s=8, frames=2)
        state = streams.init_streams(depths[0], INTR, CFG)
        state = streams.shard_streams(state, mesh)
        sharded_depths = jax.device_put(
            depths[1],
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data", None, None)),
        )
        state, res = streams.step_streams(state, sharded_depths, INTR, CFG)
        assert res.poses.shape == (8, 4, 4)
        assert bool(jnp.all(res.success))

    def test_sharded_windowed_streams_on_mesh(self):
        from realsensetracker_tpu.parallel import mesh as mesh_mod

        mesh = mesh_mod.make_mesh(8)
        depths, _ = _stream_data(s=8, frames=3)
        ref = streams.init_streams(depths[0], INTR, CFG)
        for f in range(1, 3):
            ref, _ = streams.step_streams(ref, depths[f], INTR, CFG)
        state = streams.init_streams(depths[0], INTR, CFG)
        state = streams.shard_streams(state, mesh)
        window = jax.device_put(
            jnp.moveaxis(depths[1:3], 0, 1),  # (S, W, H, Wd)
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data", None, None, None)
            ),
        )
        state, res = streams.step_streams_window(state, window, INTR, CFG)
        assert res.poses.shape == (8, 2, 4, 4)
        assert bool(jnp.all(res.success))
        np.testing.assert_allclose(
            np.asarray(state.poses), np.asarray(ref.poses), atol=1e-5
        )


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        depths, _ = _stream_data(s=1, frames=3)
        seq = depths[:, 0]
        t1 = FrameToFrameTracker(INTR, CFG, map_capacity=4096)
        t1.process(seq[0], 0.0)
        t1.process(seq[1], 1.0)
        path = os.path.join(tmp_path, "ckpt.npz")
        checkpoint.save_tracker(path, t1)

        t2 = FrameToFrameTracker(INTR, CFG, map_capacity=4096)
        checkpoint.load_tracker(path, t2)
        assert t2._index == t1._index
        assert len(t2.trajectory) == 2
        np.testing.assert_array_equal(np.asarray(t2.pose), np.asarray(t1.pose))
        assert int(t2.world_map.count()) == int(t1.world_map.count())

        # Resumed tracker continues identically to the original.
        r1 = t1.process(seq[2], 2.0)
        r2 = t2.process(seq[2], 2.0)
        np.testing.assert_allclose(
            np.asarray(r1.pose), np.asarray(r2.pose), atol=1e-6
        )

    def test_map_config_mismatch_raises(self, tmp_path):
        """Restoring a map-less snapshot into a map-enabled tracker must
        fail loudly: process() skips its map-init branch once _prev_levels
        is restored, so silently continuing would crash on _map=None at the
        first successful frame."""
        import pytest

        depths, _ = _stream_data(s=1, frames=2)
        seq = depths[:, 0]
        t1 = FrameToFrameTracker(INTR, CFG)  # map disabled
        t1.process(seq[0], 0.0)
        t1.process(seq[1], 1.0)
        path = os.path.join(tmp_path, "nomap.npz")
        checkpoint.save_tracker(path, t1)
        t2 = FrameToFrameTracker(INTR, CFG, map_capacity=4096)
        with pytest.raises(ValueError, match="world model"):
            checkpoint.load_tracker(path, t2)

    def test_version_check(self, tmp_path):
        path = os.path.join(tmp_path, "bad.npz")
        np.savez(path, format_version=np.int64(999), frame_index=np.int64(0),
                 traj_timestamps=np.zeros(0), traj_poses=np.zeros((0, 4, 4)))
        t = FrameToFrameTracker(INTR, CFG)
        try:
            checkpoint.load_tracker(path, t)
            assert False
        except ValueError:
            pass

    def test_v3_compatible_snapshot_loads(self, tmp_path):
        """v3 -> v4 changed only the resolution-FITTED level count: a v3
        snapshot whose stored pyramid matches this tracker's fitted
        schedule must still resume (refusing it would break every
        existing >= VGA checkpoint for no reason)."""
        import pytest

        depths, _ = _stream_data(s=1, frames=3)
        seq = depths[:, 0]
        t1 = FrameToFrameTracker(INTR, CFG, map_capacity=4096)
        t1.process(seq[0], 0.0)
        t1.process(seq[1], 1.0)
        path = os.path.join(tmp_path, "v3.npz")
        checkpoint.save_tracker(path, t1)
        data = dict(np.load(path, allow_pickle=False))
        data["format_version"] = np.int64(3)  # same payload, old stamp
        np.savez(path, **data)

        t2 = FrameToFrameTracker(INTR, CFG, map_capacity=4096)
        checkpoint.load_tracker(path, t2)
        r1 = t1.process(seq[2], 2.0)
        r2 = t2.process(seq[2], 2.0)
        np.testing.assert_allclose(
            np.asarray(r1.pose), np.asarray(r2.pose), atol=1e-6
        )

        # An INCOMPATIBLE v3 snapshot (level count != the fitted
        # schedule) still fails loudly.
        data["num_levels"] = np.int64(int(data["num_levels"]) + 1)
        data["format_version"] = np.int64(3)
        np.savez(path, **data)
        t3 = FrameToFrameTracker(INTR, CFG, map_capacity=4096)
        with pytest.raises(ValueError, match="re-record"):
            checkpoint.load_tracker(path, t3)


class TestSlamCheckpoint:
    def test_slam_save_load_resume(self, tmp_path):
        """A SlamTracker snapshot (VO state + keyframe store + loop edges)
        restores into a fresh tracker that continues identically -- and
        whose rebuilt keyframe database still closes loops."""
        from realsensetracker_tpu.tracking.slam import SlamConfig, SlamTracker

        scene = synthetic.default_scene(seed=21)
        step = jnp.asarray([0.03, 0.0, 0.02, 0.0, 0.025, 0.0], jnp.float32)
        poses = [se3.identity()]
        for tw in [step] * 5 + [-step] * 4:
            poses.append(se3.compose(poses[-1], se3.exp(tw)))
        depths = [synthetic.render_depth(INTR, T, scene) for T in poses]

        def make():
            cfg = SlamConfig(
                intrinsics=INTR, icp=CFG, loop_min_separation=3,
                loop_similarity=0.8, keyframe_cloud_capacity=1024,
            )
            cfg.align.fpfh_max_neighbors = 32
            t = SlamTracker(cfg)
            t._vo.max_translation = 1e-6  # every frame a keyframe
            t._vo.max_rotation = 1e-6
            return t

        t1 = make()
        for i in range(6):
            t1.process(depths[i], float(i))
        path = os.path.join(tmp_path, "slam.npz")
        checkpoint.save_slam(path, t1)

        t2 = make()
        checkpoint.load_slam(path, t2)
        assert t2.keyframe_count == t1.keyframe_count
        assert len(t2._db) == len(t1._db)
        assert len(t2.trajectory) == len(t1.trajectory)

        for i in range(6, 10):
            r1 = t1.process(depths[i], float(i))
            r2 = t2.process(depths[i], float(i))
            np.testing.assert_allclose(
                np.asarray(r1.pose), np.asarray(r2.pose), atol=1e-5
            )
        # The resumed tracker's database must still detect the revisit.
        assert t2.num_loop_closures == t1.num_loop_closures
        assert t2.num_loop_closures >= 1

    def test_slam_version_check(self, tmp_path):
        from realsensetracker_tpu.tracking.slam import SlamConfig, SlamTracker

        path = os.path.join(tmp_path, "bad.npz")
        np.savez(path, slam_version=np.int64(999), format_version=np.int64(1))
        t = SlamTracker(SlamConfig(intrinsics=INTR, icp=CFG))
        try:
            checkpoint.load_slam(path, t)
            assert False
        except ValueError:
            pass


class TestTsdfStreams:
    """Dense (TSDF frame-to-model) multi-stream steps: parity with the
    single-stream TsdfTracker, window scan, and mesh sharding."""

    VOL = None  # built lazily (TsdfConfig import at module scope is fine
    # but keep the test-local config near its tests)

    @classmethod
    def _cfg(cls):
        from realsensetracker_tpu.mapping.tsdf import TsdfConfig

        return TsdfConfig(
            resolution=48, voxel_size=0.12, origin=(-2.88, -2.16, -0.4),
            trunc=0.36, max_range=5.0,
        )

    @classmethod
    def _icp(cls):
        return projective.ProjectiveIcpConfig(
            iters=(3, 3), inner_iters=2, samples=768, min_samples=192
        )

    def test_matches_single_stream_tracker(self):
        from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

        depths, _ = _stream_data(s=2, frames=4)
        cfg, icp = self._cfg(), self._icp()
        state = streams.init_tsdf_streams(depths[0], INTR, cfg)
        for f in range(1, 4):
            state, res = streams.step_tsdf_streams(
                state, depths[f], INTR, cfg, icp
            )
            assert bool(res.success.all()), f"frame {f}"
        for i in range(2):
            tr = TsdfTracker(INTR, volume=cfg, icp=icp)
            for f in range(4):
                tr.process(np.asarray(depths[f, i]), float(f))
            np.testing.assert_allclose(
                np.asarray(state.poses[i]), np.asarray(tr.pose), atol=1e-5
            )
            # Volume parity is checked statistically: the vmapped slot
            # path and the single tracker fuse/tile their matmuls
            # differently, so the registered pose differs by an ulp and
            # voxels sitting exactly on the truncation-band edge can take
            # visibly different weighted updates (their update gate is a
            # step function of the pose). Allow a vanishing fraction of
            # such edge voxels; everything else must match tightly.
            diff = np.abs(
                np.asarray(state.volume.tsdf[i]) - np.asarray(tr._vol.tsdf)
            )
            assert (diff > 1e-5).mean() < 1e-4, (diff > 1e-5).mean()
            assert diff.max() < 5e-3, diff.max()

    def test_window_matches_per_frame(self):
        depths, _ = _stream_data(s=2, frames=5)
        cfg, icp = self._cfg(), self._icp()
        a = streams.init_tsdf_streams(depths[0], INTR, cfg)
        b = streams.init_tsdf_streams(depths[0], INTR, cfg)
        per = []
        for f in range(1, 5):
            a, res = streams.step_tsdf_streams(a, depths[f], INTR, cfg, icp)
            per.append(np.asarray(res.poses))
        b, resw = streams.step_tsdf_streams_window(
            b, jnp.moveaxis(depths[1:5], 0, 1), INTR, cfg, icp
        )
        for f in range(4):
            np.testing.assert_allclose(
                np.asarray(resw.poses[:, f]), per[f], atol=1e-5
            )
        np.testing.assert_allclose(
            np.asarray(a.volume.tsdf), np.asarray(b.volume.tsdf), atol=1e-5
        )

    def test_sharded_slots_on_mesh(self):
        if len(jax.devices()) < 2:
            import pytest

            pytest.skip("needs multiple devices")
        from realsensetracker_tpu.parallel.mesh import make_mesh

        depths, _ = _stream_data(s=2, frames=3)
        cfg, icp = self._cfg(), self._icp()
        mesh = make_mesh(2)
        ref = streams.init_tsdf_streams(depths[0], INTR, cfg)
        state = streams.shard_streams(ref, mesh)
        assert len(state.volume.tsdf.sharding.device_set) == 2
        for f in range(1, 3):
            ref, _ = streams.step_tsdf_streams(ref, depths[f], INTR, cfg, icp)
            state, _ = streams.step_tsdf_streams(
                state, depths[f], INTR, cfg, icp
            )
        np.testing.assert_allclose(
            np.asarray(state.poses), np.asarray(ref.poses), atol=1e-5
        )


class TestU16Streams:
    """Raw integer (u16) depth ingestion: uploads half the bytes and
    converts to meters inside the compiled step
    (ops/pyramid.depth_to_meters; depth_scale static arg). Must match the
    f32 path on identically-quantized inputs, per-step and windowed."""

    def test_masked_u16_matches_f32(self):
        depths, _ = _stream_data(s=3, frames=4)
        scale = 1.0 / 5000.0
        raw = np.asarray(np.asarray(depths) * 5000.0 + 0.5, np.uint16)
        quant = raw.astype(np.float32) * np.float32(scale)
        on = jnp.ones((3,), bool)
        off = jnp.zeros((3,), bool)
        a = streams.blank_streams(INTR, CFG, num_streams=3)
        b = streams.blank_streams(INTR, CFG, num_streams=3)
        a, _ = streams.step_streams_masked(a, jnp.asarray(quant[0]), on, on,
                                           INTR, CFG)
        b, _ = streams.step_streams_masked(b, jnp.asarray(raw[0]), on, on,
                                           INTR, CFG, depth_scale=scale)
        for f in range(1, 4):
            a, sa = streams.step_streams_masked(a, jnp.asarray(quant[f]),
                                                on, off, INTR, CFG)
            b, sb = streams.step_streams_masked(b, jnp.asarray(raw[f]),
                                                on, off, INTR, CFG,
                                                depth_scale=scale)
            np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                       atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.poses), np.asarray(b.poses),
                                   atol=1e-6)

    def test_windowed_u16_matches_f32(self):
        depths, _ = _stream_data(s=2, frames=5)
        scale = 1.0 / 5000.0
        raw = np.asarray(np.asarray(depths) * 5000.0 + 0.5, np.uint16)
        quant = raw.astype(np.float32) * np.float32(scale)
        a = streams.init_streams(jnp.asarray(quant[0]), INTR, CFG)
        b = streams.init_streams(jnp.asarray(raw[0]), INTR, CFG,
                                 depth_scale=scale)
        wq = jnp.moveaxis(jnp.asarray(quant[1:5]), 0, 1)
        wr_ = jnp.moveaxis(jnp.asarray(raw[1:5]), 0, 1)
        a, ra = streams.step_streams_window(a, wq, INTR, CFG)
        b, rb = streams.step_streams_window(b, wr_, INTR, CFG,
                                            depth_scale=scale)
        np.testing.assert_allclose(np.asarray(ra.poses),
                                   np.asarray(rb.poses), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.poses), np.asarray(b.poses),
                                   atol=1e-6)
