"""RGB path end-to-end: synthetic color rendering, clip format v2, TUM rgb
decoding, and joint geometric+photometric registration/tracking.

Covers the reference's color capabilities the depth-only round-1 framework
lacked: color conversion + per-point color lookup (rs_driver.cpp:17-31,
33-103), colored recorded clips (rs_viewer.cpp:105-112), and the intended
photometric objective (photometric_cost.hpp) -- now fed by REAL rendered
intensities instead of ad-hoc test textures.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from realsensetracker_tpu.align import projective, rgbd
from realsensetracker_tpu.data import recorded, synthetic, tum
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.ops.sampling import bilinear_sample

INTR = camera.Intrinsics(fx=160.0, fy=160.0, cx=99.5, cy=74.5, width=200, height=150)


class TestSyntheticColor:
    def test_depth_matches_depth_only_renderer(self):
        scene = synthetic.default_scene()
        d_ref = synthetic.render_depth(INTR, se3.identity(), scene)
        d, c = synthetic.render_rgbd(INTR, se3.identity(), scene)
        np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
        assert c.shape == (INTR.height, INTR.width, 3)
        assert float(c.min()) >= 0.0 and float(c.max()) <= 1.0

    def test_world_anchored_shading_is_view_consistent(self):
        # The property direct alignment needs: a surface point has the same
        # intensity in every view (up to bilinear interpolation error).
        scene = synthetic.default_scene()
        tw = jnp.array([0.02, -0.01, 0.015, 0.01, -0.008, 0.012], jnp.float32)
        T = se3.exp(tw)
        d0, c0 = synthetic.render_rgbd(INTR, se3.identity(), scene)
        d1, c1 = synthetic.render_rgbd(INTR, T, scene)
        g0 = synthetic.intensity_from_rgb(c0)
        g1 = synthetic.intensity_from_rgb(c1)
        valid = d1 > 0.05
        verts = camera.unproject_depth(jnp.where(valid, d1, 0.0), INTR)
        p0 = se3.transform_points(T, verts.reshape(-1, 3))
        u, v, z = camera.project(p0, INTR)
        vals, inb = bilinear_sample(g0, u, v)
        ok = np.asarray(inb & valid.reshape(-1) & (z > 0.05))
        diff = np.abs(np.asarray(vals - g1.reshape(-1)))[ok]
        assert np.median(diff) < 5e-4  # occlusion edges inflate the tail

    def test_miss_pixels_are_black_and_zero_depth(self):
        # Wall behind the camera (rays never reach z=-10) and floor far
        # below: upward rays that miss the sphere hit NOTHING.
        scene = synthetic.Scene(
            sphere_centers=jnp.zeros((1, 3)).at[0, 2].set(2.0),
            sphere_radii=jnp.full((1,), 0.3),
            floor_y=1e6, wall_z=-10.0,
        )
        d, c = synthetic.render_rgbd(INTR, se3.identity(), scene)
        miss = np.asarray(d) == 0.0
        assert miss.any() and (~miss).any()
        assert np.all(np.asarray(c)[miss] == 0.0)


class TestClipV2:
    def test_roundtrip_python(self, tmp_path):
        rng = np.random.default_rng(0)
        depths = rng.uniform(0.5, 3.0, (3, 24, 32)).astype(np.float32)
        colors = rng.integers(0, 256, (3, 24, 32, 3), dtype=np.uint8)
        stamps = np.arange(3, dtype=np.float64)
        intr = camera.Intrinsics(fx=30.0, fy=30.0, cx=15.5, cy=11.5, width=32, height=24)
        path = str(tmp_path / "c.rsc")
        recorded.write_clip(path, depths, stamps, intr, colors=colors)
        clip = recorded.read_clip_py(path)
        assert clip.has_color
        np.testing.assert_array_equal(clip.colors, colors)
        assert np.abs(clip.depths - depths).max() <= 5.1e-4  # u16 mm quantization
        assert clip.gray(0).shape == (24, 32)

    def test_v1_still_reads(self, tmp_path):
        depths = np.full((2, 8, 8), 1.5, np.float32)
        path = str(tmp_path / "v1.rsc")
        intr = camera.Intrinsics(fx=8.0, fy=8.0, cx=3.5, cy=3.5, width=8, height=8)
        recorded.write_clip(path, depths, np.arange(2.0), intr)
        clip = recorded.read_clip_py(path)
        assert not clip.has_color and clip.colors is None

    def test_roundtrip_native(self, tmp_path):
        pytest.importorskip("realsensetracker_tpu.native")
        try:
            from realsensetracker_tpu.native import clip_io, load

            load()
        except OSError:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(1)
        depths = rng.uniform(0.5, 3.0, (2, 16, 16)).astype(np.float32)
        colors = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
        stamps = np.arange(2, dtype=np.float64)
        intr = camera.Intrinsics(fx=16.0, fy=16.0, cx=7.5, cy=7.5, width=16, height=16)
        p1 = str(tmp_path / "py.rsc")
        p2 = str(tmp_path / "nat.rsc")
        recorded.write_clip(p1, depths, stamps, intr, colors=colors)
        nat = clip_io.read_clip(p1)
        np.testing.assert_array_equal(nat.colors, colors)
        clip_io.write_clip(p2, depths, stamps, intr, colors=colors)
        back = recorded.read_clip_py(p2)
        np.testing.assert_array_equal(back.colors, colors)
        np.testing.assert_array_equal(back.depths, nat.depths)

    def test_record_synthetic_with_color(self, tmp_path):
        path = str(tmp_path / "rgbd.rsc")
        clip = recorded.record_synthetic_clip(
            path, num_frames=3, width=64, height=48, with_color=True
        )
        assert clip.has_color
        assert clip.colors.shape == (3, 48, 64, 3)
        assert clip.colors.max() > 0


class TestTumRgb:
    def test_synthesized_sequence_rgb_roundtrip(self, tmp_path):
        root = tum.synthesize_tum_sequence(
            str(tmp_path / "seq"), num_frames=3, width=64, height=48,
            with_color=True,
        )
        seq = tum.TumSequence.open(root)
        assert len(seq.rgb_index) == 3
        rgb = seq.rgb(0)
        assert rgb.shape == (48, 64, 3) and rgb.dtype == np.uint8
        assert seq.associate_rgb(1) == 1
        frames = list(seq.frames_rgbd())
        assert len(frames) == 3
        ts, depth, gray = frames[0]
        assert gray is not None and gray.shape == (48, 64)
        assert 0.0 <= gray.min() and gray.max() <= 1.0

    def test_association_respects_max_dt(self, tmp_path):
        root = tum.synthesize_tum_sequence(
            str(tmp_path / "seq"), num_frames=2, width=32, height=24,
            with_color=True,
        )
        seq = tum.TumSequence.open(root)
        assert seq.associate_rgb(0, max_dt=1e-9) == 0  # exact stamps
        seq.rgb_index = [(99.0, seq.rgb_index[0][1])]  # far-away rgb stamp
        assert seq.associate_rgb(0, max_dt=0.05) is None


class TestRgbdAlignment:
    def test_recovers_pose_on_cluttered_scene(self):
        scene = synthetic.default_scene()
        tw = jnp.array([0.02, -0.015, 0.02, 0.012, -0.01, 0.015], jnp.float32)
        d0, c0 = synthetic.render_rgbd(INTR, se3.identity(), scene)
        d1, c1 = synthetic.render_rgbd(INTR, se3.exp(tw), scene)
        g0 = synthetic.intensity_from_rgb(c0)
        g1 = synthetic.intensity_from_rgb(c1)
        res = rgbd.register_rgbd_pair(d1, g1, d0, g0, INTR)
        err = np.abs(np.asarray(se3.log(se3.compose(se3.inverse(se3.exp(tw)), res.transform))))
        assert err.max() < 2e-3
        assert float(res.inlier_fraction) > 0.5

    def test_constrains_geometry_degenerate_slide(self):
        # Flat wall: point-to-plane leaves in-plane translation unobservable;
        # the photometric term pins it. THE reason the RGB path exists.
        scene = synthetic.Scene(
            sphere_centers=jnp.full((1, 3), 100.0),
            sphere_radii=jnp.full((1,), 0.01),
            floor_y=100.0, wall_z=3.0,
        )
        tw = jnp.array([0.02, -0.015, 0.0, 0.0, 0.0, 0.01], jnp.float32)
        d0, c0 = synthetic.render_rgbd(INTR, se3.identity(), scene)
        d1, c1 = synthetic.render_rgbd(INTR, se3.exp(tw), scene)
        g0 = synthetic.intensity_from_rgb(c0)
        g1 = synthetic.intensity_from_rgb(c1)

        geo = projective.register_depth_pair(d1, d0, INTR)
        err_geo = np.abs(
            np.asarray(se3.log(se3.compose(se3.inverse(se3.exp(tw)), geo.transform)))
        ).max()
        res = rgbd.register_rgbd_pair(d1, g1, d0, g0, INTR)
        err_rgbd = np.abs(
            np.asarray(se3.log(se3.compose(se3.inverse(se3.exp(tw)), res.transform)))
        ).max()
        assert err_geo > 5e-3  # geometry alone genuinely fails here
        assert err_rgbd < 5e-4
        assert err_rgbd < err_geo / 10

    def test_photometric_module_on_rendered_intensities(self):
        # align/photometric.py fed by the REAL renderer (not a test texture).
        from realsensetracker_tpu.align import photometric

        # Edge-free wall+floor scene: photometric-only alignment assumes
        # intensity smoothness, which occlusion edges in cluttered scenes
        # violate (the joint rgbd aligner handles those; see above).
        scene = synthetic.Scene(
            sphere_centers=jnp.full((1, 3), 100.0),
            sphere_radii=jnp.full((1,), 0.01),
            floor_y=1.2, wall_z=4.0,
        )
        tw = jnp.array([0.01, -0.008, 0.012, 0.006, -0.005, 0.008], jnp.float32)
        T = se3.exp(tw)
        d0, c0 = synthetic.render_rgbd(INTR, se3.identity(), scene)
        d1, c1 = synthetic.render_rgbd(INTR, T, scene)
        g0 = synthetic.intensity_from_rgb(c0)
        g1 = synthetic.intensity_from_rgb(c1)
        pts, inten, ok = photometric.sample_intensity_points(d1, g1, INTR, 2048)
        res = photometric.align_photometric(
            pts.astype(jnp.float32), inten.astype(jnp.float32), ok,
            g0.astype(jnp.float32), INTR,
            cfg=photometric.PhotometricConfig(iters=30),
        )
        err = np.abs(np.asarray(se3.log(se3.compose(se3.inverse(T), res.transform))))
        assert err.max() < 5e-3


class TestRgbdTracker:
    def test_trajectory_on_rgbd_clip(self, tmp_path):
        from realsensetracker_tpu.api import Tracker, TrackerConfig

        path = str(tmp_path / "t.rsc")
        intr_w, intr_h = 160, 120
        clip = recorded.record_synthetic_clip(
            path, num_frames=6, width=intr_w, height=intr_h, with_color=True
        )
        cfg = TrackerConfig(intrinsics=clip.intrinsics, method="rgbd")
        tracker = Tracker(cfg)
        for i in range(len(clip)):
            res = tracker.process(
                clip.depths[i], clip.timestamps[i], color=clip.colors[i]
            )
            assert res.success
        assert len(tracker.trajectory) == len(clip)
        # Random-walk steps are ~0.02: poses must have moved off identity.
        final = np.asarray(tracker.pose)
        assert np.abs(final - np.eye(4)).max() > 1e-4

    def test_rgbd_requires_color(self):
        from realsensetracker_tpu.api import Tracker, TrackerConfig

        tracker = Tracker(TrackerConfig(method="rgbd"))
        with pytest.raises(ValueError, match="color"):
            tracker.process(np.ones((480, 640), np.float32), 0.0)

    def test_tracker_accepts_rgb_uint8(self, tmp_path):
        from realsensetracker_tpu.api import Tracker, TrackerConfig

        intr = camera.Intrinsics(fx=64.0, fy=64.0, cx=39.5, cy=29.5, width=80, height=60)
        scene = synthetic.default_scene()
        d, c = synthetic.render_rgbd(intr, se3.identity(), scene)
        c8 = np.clip(np.asarray(c) * 255, 0, 255).astype(np.uint8)
        tracker = Tracker(TrackerConfig(intrinsics=intr, method="rgbd"))
        res = tracker.process(np.asarray(d), 0.0, color=c8)
        assert res.success
