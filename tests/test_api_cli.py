"""API facade, pipeline registry, vis writers, and CLI smoke tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from realsensetracker_tpu.api import Tracker, TrackerConfig
from realsensetracker_tpu.align.projective import ProjectiveIcpConfig
from realsensetracker_tpu.data import recorded, synthetic
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.models import align_pair, get_pipeline, list_pipelines
from realsensetracker_tpu.api.config import AlignConfig
from realsensetracker_tpu.ops import cloud as cloud_mod

INTR = camera.Intrinsics(fx=100.0, fy=100.0, cx=49.5, cy=37.0, width=100, height=75)
PCFG = ProjectiveIcpConfig(iters=(5, 5, 6), samples=1024)


def _frames(n=4, seed=0):
    depths, poses = synthetic.render_trajectory(INTR, n, seed=seed, step_scale=0.015)
    return depths, poses


class TestTrackerFacade:
    def test_as_gray_uint8_scaling_both_arities(self):
        """Regression: a 2D uint8 grayscale must scale by 1/255 exactly like
        the 3-channel uint8 case (the photometric term assumes [0,1])."""
        from realsensetracker_tpu.api.tracker import _as_gray

        g8 = (np.arange(12, dtype=np.uint8) * 20).reshape(3, 4)
        out2d = _as_gray(g8)
        assert out2d.max() <= 1.0
        np.testing.assert_allclose(out2d, g8.astype(np.float32) / 255.0)
        rgb8 = np.stack([g8, g8, g8], axis=-1)
        np.testing.assert_allclose(_as_gray(rgb8), out2d, atol=1e-6)
        # float inputs pass through unscaled in both arities.
        gf = g8.astype(np.float32) / 255.0
        np.testing.assert_allclose(_as_gray(gf), gf)

    @pytest.mark.parametrize("method", ["projective", "keyframe"])
    def test_depth_methods_track(self, method):
        depths, poses = _frames(4)
        tr = Tracker(TrackerConfig(intrinsics=INTR, method=method, projective=PCFG))
        for i in range(4):
            res = tr.process(depths[i], float(i))
            assert res.success
        est = np.asarray(tr.pose)
        true = np.asarray(poses[3])
        delta = np.abs(np.asarray(se3.log(
            se3.compose(se3.inverse(jnp.asarray(true)), jnp.asarray(est)))))
        assert delta.max() < 0.05

    def test_cloud_method_icp(self):
        depths, _ = _frames(3)
        cfg = TrackerConfig(intrinsics=INTR, method="icp")
        cfg.align.icp_max_iter = 16
        cfg.align.cloud_capacity = 2048
        tr = Tracker(cfg)
        for i in range(3):
            res = tr.process(depths[i], float(i))
            assert res.success
        assert len(tr.trajectory) == 3

    def test_save_trajectory(self, tmp_path):
        depths, _ = _frames(2)
        tr = Tracker(TrackerConfig(intrinsics=INTR, projective=PCFG))
        tr.process(depths[0])
        tr.process(depths[1])
        p = os.path.join(tmp_path, "t.txt")
        tr.save_trajectory(p)
        assert os.path.getsize(p) > 0

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError):
            Tracker(TrackerConfig(method="warp-drive"))


class TestModels:
    def test_registry_lists_expected(self):
        names = list_pipelines()
        for expect in ["projective-icp", "gnc-icp", "gicp", "fpfh-kabsch-icp", "robust-global"]:
            assert expect in names

    def test_align_pair_recovers_pose(self):
        key_pts = 0.8 * np.random.RandomState(0).randn(1500, 3).astype(np.float32)
        src = cloud_mod.pad_to_capacity(key_pts, 2048)
        T_true = se3.exp(jnp.array([0.04, -0.02, 0.03, 0.03, 0.02, -0.04], jnp.float32))
        dst_pts = np.asarray(se3.transform_points(T_true, jnp.asarray(key_pts)))
        dst = cloud_mod.pad_to_capacity(dst_pts, 2048)
        cfg = AlignConfig(voxel_size=0.05, icp_max_iter=48, cloud_capacity=2048,
                          fpfh_max_neighbors=32)
        res = align_pair(src, dst, cfg)
        err = np.abs(np.asarray(se3.log(
            se3.compose(se3.inverse(T_true), res.transform))))
        assert err.max() < 5e-3

    def test_projective_pipeline_callable(self):
        run = get_pipeline("projective-icp", intr=INTR, cfg=PCFG)
        d0, d1, T_true = synthetic.render_pair(INTR, jnp.asarray([0.01, 0, 0, 0, 0, 0]))
        out = run(d1, d0)
        err = np.abs(np.asarray(se3.log(
            se3.compose(se3.inverse(T_true), out.transform))))
        assert err.max() < 5e-3

    def test_keyframe_pipeline_honors_pairwise_contract(self):
        """Every registry entry is run(src, dst) -> .transform; 'keyframe'
        used to return a zero-arg tracker factory instead."""
        run = get_pipeline("keyframe", intr=INTR, cfg=PCFG)
        d0, d1, T_true = synthetic.render_pair(
            INTR, jnp.asarray([0.01, 0, 0, 0, 0, 0])
        )
        out = run(d1, d0)
        err = np.abs(np.asarray(se3.log(
            se3.compose(se3.inverse(T_true), out.transform))))
        assert err.max() < 5e-3

    def test_align_clip_capacity_overflow_spans_image(self):
        """_cloud_from_depth at a capacity far below the valid-pixel count
        must subsample uniformly (a head slice kept only the TOP ~cap/W
        image rows and registered garbage slivers)."""
        from realsensetracker_tpu.cli.rs_align import _cloud_from_depth

        d = synthetic.render_depth(INTR, se3.identity(),
                                   synthetic.default_scene(seed=2))
        full = _cloud_from_depth(np.asarray(d), INTR, 100000)
        full_pts = np.asarray(full.points)[np.asarray(full.mask)]
        assert len(full_pts) > 1000  # scene large enough to overflow cap

        c = _cloud_from_depth(np.asarray(d), INTR, 256)
        pts = np.asarray(c.points)[np.asarray(c.mask)]
        assert len(pts) == 256
        # Camera-frame y tracks image rows: the subsample must span
        # (nearly) the full valid row range; the old head slice kept only
        # the TOP ~256/W rows (a small fraction of the y span).
        span_full = full_pts[:, 1].max() - full_pts[:, 1].min()
        span_kept = pts[:, 1].max() - pts[:, 1].min()
        assert span_kept > 0.8 * span_full


class TestVis:
    def test_render_and_ply(self, tmp_path):
        from realsensetracker_tpu.vis import export_ply, render_cloud_png, save_xyzrgb, load_xyzrgb

        pts = np.random.RandomState(0).rand(100, 3).astype(np.float32)
        png = os.path.join(tmp_path, "c.png")
        render_cloud_png(png, [(pts, "red")])
        assert os.path.getsize(png) > 1000

        ply = os.path.join(tmp_path, "c.ply")
        export_ply(ply, pts, np.ones_like(pts) * 0.5)
        head = open(ply).read(200)
        assert "element vertex 100" in head

        xyz = os.path.join(tmp_path, "c.xyzrgb")
        save_xyzrgb(xyz, pts, np.ones_like(pts))
        p2, c2 = load_xyzrgb(xyz)
        np.testing.assert_allclose(p2, pts, atol=1e-5)

    def test_fpfh_pca_colors_range(self):
        from realsensetracker_tpu.vis import fpfh_pca_colors

        f = np.random.RandomState(1).rand(50, 33)
        c = fpfh_pca_colors(f)
        assert c.shape == (50, 3)
        assert c.min() >= 0.0 and c.max() <= 1.0


class TestCli:
    def test_viewer_record_and_view(self, tmp_path):
        from realsensetracker_tpu.cli import rs_viewer

        clip_path = os.path.join(tmp_path, "c.rsc")
        assert rs_viewer.main(["--record", clip_path, "--frames", "3",
                               "--width", "64", "--height", "48"]) == 0
        assert rs_viewer.main(["--view", clip_path]) == 0

    def test_replay_clip(self, tmp_path, capsys):
        from realsensetracker_tpu.cli import rs_replay

        clip_path = os.path.join(tmp_path, "c.rsc")
        recorded.record_synthetic_clip(clip_path, num_frames=3, width=64, height=48)
        traj = os.path.join(tmp_path, "traj.txt")
        rc = rs_replay.main(["--record", clip_path, "--trajectory-out", traj,
                             "--method", "projective"])
        assert rc == 0
        assert len(open(traj).readlines()) == 3

    def test_replay_start_frame_plus_max_frames(self, tmp_path, capsys):
        """--max-frames is a COUNT from --start-frame, not an absolute end
        index (--start-frame 2 --max-frames 2 used to give range(2, 2) ->
        'processed 0 frames' with exit code 0)."""
        from realsensetracker_tpu.cli import rs_replay

        clip_path = os.path.join(tmp_path, "c.rsc")
        recorded.record_synthetic_clip(clip_path, num_frames=5, width=64,
                                       height=48)
        traj = os.path.join(tmp_path, "traj.txt")
        rc = rs_replay.main(["--record", clip_path, "--start-frame", "2",
                             "--max-frames", "2", "--trajectory-out", traj,
                             "--method", "projective"])
        assert rc == 0
        assert len(open(traj).readlines()) == 2

    def test_align_clip(self, tmp_path, capsys):
        from realsensetracker_tpu.cli import rs_align

        clip_path = os.path.join(tmp_path, "c.rsc")
        recorded.record_synthetic_clip(clip_path, num_frames=2, width=64, height=48)
        rc = rs_align.main(["--clip", clip_path, "--capacity", "1024",
                            "--feature-radius", "0.4", "-k", "8"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "transform" in out

    def test_capture_ply(self, tmp_path):
        from realsensetracker_tpu.cli import capture

        out = os.path.join(tmp_path, "{:02d}.ply")
        rc = capture.main(["--frames", "2", "--out", out])
        assert rc == 0
        assert os.path.exists(os.path.join(tmp_path, "00.ply"))


class TestReplayTumAte:
    def test_tum_replay_with_ate(self, tmp_path, capsys):
        from realsensetracker_tpu.cli import rs_replay
        from realsensetracker_tpu.data import tum

        root = tum.synthesize_tum_sequence(str(tmp_path), num_frames=4, width=64, height=48)
        rc = rs_replay.main(["--tum", root, "--ate", "--max-frames", "4"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "ATE" in out

    def test_slam_method_runs(self, tmp_path, capsys):
        from realsensetracker_tpu.cli import rs_replay
        from realsensetracker_tpu.data import recorded

        clip_path = os.path.join(tmp_path, "c.rsc")
        recorded.record_synthetic_clip(clip_path, num_frames=3, width=64, height=48)
        rc = rs_replay.main(["--record", clip_path, "--method", "slam"])
        assert rc == 0
        assert "keyframes=" in capsys.readouterr().out

    def test_tsdf_save_resume_state(self, tmp_path, capsys):
        """A --method tsdf run snapshots its dense volume and a second
        invocation continues from it (the dense analog of SLAM
        --save-state; reference restart semantics have no analog -- the
        C++ app always restarts from scratch)."""
        from realsensetracker_tpu.cli import rs_replay
        from realsensetracker_tpu.data import recorded

        clip_path = os.path.join(tmp_path, "c.rsc")
        recorded.record_synthetic_clip(clip_path, num_frames=6, width=64,
                                       height=48)
        state = os.path.join(tmp_path, "tsdf.npz")
        vol = ["--tsdf-resolution", "48", "--tsdf-voxel", "0.08"]
        rc = rs_replay.main(["--record", clip_path, "--method", "tsdf",
                             "--max-frames", "4", "--save-state", state]
                            + vol)
        assert rc == 0
        assert "state ->" in capsys.readouterr().out
        assert os.path.exists(state)
        mesh_out = os.path.join(tmp_path, "mesh.ply")
        rc = rs_replay.main(["--record", clip_path, "--method", "tsdf",
                             "--start-frame", "4", "--resume-state", state,
                             "--save-mesh", mesh_out] + vol)
        assert rc == 0
        out = capsys.readouterr().out
        assert "resumed frame 4" in out
        assert "processed 2 frames" in out
        assert "mesh (" in out and os.path.exists(mesh_out)


class TestStreamsCli:
    def test_streams_demo_runs(self, capsys):
        from realsensetracker_tpu.cli import rs_streams

        rc = rs_streams.main(["--streams", "2", "--frames", "3",
                              "--width", "64", "--height", "48"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "FPS/stream" in out

    def test_streams_demo_windowed(self, capsys):
        from realsensetracker_tpu.cli import rs_streams

        rc = rs_streams.main(["--streams", "2", "--frames", "5",
                              "--width", "64", "--height", "48",
                              "--window", "2"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "frame 4: 2/2 streams tracking" in out
        assert "FPS/stream" in out

    def test_streams_rgbd(self, capsys):
        from realsensetracker_tpu.cli import rs_streams

        rc = rs_streams.main(["--streams", "2", "--frames", "4",
                              "--width", "64", "--height", "48", "--rgb",
                              "--window", "2"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "RGB-D streams" in out
        assert "frame 3: 2/2 streams tracking" in out  # windowed + tail
        assert "FPS/stream" in out

    def test_streams_tsdf(self, capsys):
        from realsensetracker_tpu.cli import rs_streams

        # 80x60 with 12 cm voxels: the coarsest scale where all synthetic
        # streams keep tracking (64x48/8 cm drops one stream's inliers
        # below the 0.2 gate -- a scale artifact, not a regression signal).
        rc = rs_streams.main(["--streams", "2", "--frames", "4",
                              "--width", "80", "--height", "60", "--tsdf",
                              "--tsdf-resolution", "48", "--tsdf-voxel",
                              "0.12", "--window", "2"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "dense (TSDF) streams" in out
        assert "frame 3: 2/2 streams tracking" in out
        assert "FPS/stream" in out

    def test_streams_windowed_tail_not_dropped(self, capsys):
        """(frames-1) % window != 0: the trailing steps run per-frame
        instead of being silently dropped from the run/summary."""
        from realsensetracker_tpu.cli import rs_streams

        rc = rs_streams.main(["--streams", "2", "--frames", "4",
                              "--width", "64", "--height", "48",
                              "--window", "2"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "frame 3: 2/2 streams tracking" in out  # the tail step
        assert "x 3 steps" in out


def test_tracker_model_method():
    depths, _ = _frames(3)
    tr = Tracker(TrackerConfig(intrinsics=INTR, method="model"))
    for i in range(3):
        res = tr.process(depths[i], float(i))
        assert res.success
    assert tr.world_map is not None and int(tr.world_map.count()) > 50
