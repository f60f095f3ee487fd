"""Host-side depth-unit policy (data/depth_units.py) and the ingestion
hardening from the round-4 review: wide integers must never silently
wrap through astype(uint16), and mixed raw/float windows must not smuggle
integer COUNTS into the scan as meters."""

import numpy as np
import pytest

from realsensetracker_tpu.data.depth_units import stage_depth_np, to_meters_np


class TestToMeters:
    def test_integer_scales(self):
        a = np.array([[0, 5000]], np.uint16)
        out = to_meters_np(a, 1.0 / 5000.0)
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, [[0.0, 1.0]])

    def test_float_passthrough(self):
        a = np.array([[1.5]], np.float64)
        out = to_meters_np(a, 123.0)  # scale must NOT apply to floats
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, [[1.5]])


class TestStageDepth:
    def test_uint16_stays_raw(self):
        a = np.array([[1, 65535]], np.uint16)
        staged, is_raw = stage_depth_np(a, 1e-3)
        assert is_raw and staged.dtype == np.uint16
        assert staged is a  # no copy on the hot path

    def test_fitting_wider_int_casts_exact(self):
        a = np.array([[0, 65535]], np.int32)
        staged, is_raw = stage_depth_np(a, 1e-3)
        assert is_raw and staged.dtype == np.uint16
        np.testing.assert_array_equal(staged, [[0, 65535]])

    def test_overflowing_int_converts_to_meters_not_wraps(self):
        # astype(np.uint16) would wrap 100000 -> 34464 silently.
        a = np.array([[100000, 5000]], np.int32)
        staged, is_raw = stage_depth_np(a, 1e-3)
        assert not is_raw and staged.dtype == np.float32
        np.testing.assert_allclose(staged, [[100.0, 5.0]])

    def test_negative_int_converts_to_meters_not_wraps(self):
        a = np.array([[-1, 5000]], np.int64)  # -1: common invalid marker
        staged, is_raw = stage_depth_np(a, 1e-3)
        assert not is_raw
        np.testing.assert_allclose(staged, [[-1e-3, 5.0]])

    def test_float_is_meters(self):
        staged, is_raw = stage_depth_np(np.array([[2.0]], np.float32), 1e-3)
        assert not is_raw and staged.dtype == np.float32


class TestServiceDepthGuard:
    def test_wide_int_body_rejected(self):
        from realsensetracker_tpu.api.service import _as_depth

        ok = _as_depth(np.array([[5000]], np.int32))
        assert ok.dtype == np.uint16
        with pytest.raises(ValueError):
            _as_depth(np.array([[100000]], np.int32))
        with pytest.raises(ValueError):
            _as_depth(np.array([[-1]], np.int32))


class TestMixedDtypeWindows:
    def test_keyframe_window_mixed_raw_and_meters(self):
        """A window mixing one f32-meters frame with raw u16 frames must
        track identically to the all-quantized-meters run (previously the
        np.stack promoted the raw frames to float COUNTS)."""
        from realsensetracker_tpu.align import projective
        from realsensetracker_tpu.data import synthetic
        from realsensetracker_tpu.geometry import camera, se3
        from realsensetracker_tpu.tracking.keyframe import KeyframeTracker

        import jax.numpy as jnp

        intr = camera.Intrinsics(fx=100.0, fy=100.0, cx=49.5, cy=37.0,
                                 width=100, height=75)
        cfg = projective.ProjectiveIcpConfig(iters=(4, 4, 5), samples=1024)
        scene = synthetic.default_scene(seed=21)
        step = jnp.asarray([0.01, 0.0, 0.01, 0.0, 0.01, 0.0], jnp.float32)
        poses = [se3.identity()]
        for _ in range(4):
            poses.append(se3.compose(poses[-1], se3.exp(step)))
        depths = [synthetic.render_depth(intr, T, scene) for T in poses]
        scale = 1.0 / 5000.0
        raw = [np.asarray(np.asarray(d) * 5000.0 + 0.5, np.uint16)
               for d in depths]
        quant = [r.astype(np.float32) * np.float32(scale) for r in raw]
        mixed = list(raw)
        mixed[2] = quant[2]  # one pre-converted frame inside the window

        ref = KeyframeTracker(intr, cfg, depth_scale=scale)
        mix = KeyframeTracker(intr, cfg, depth_scale=scale)
        ra = [ref.process(d, float(i)) for i, d in enumerate(quant)]
        mix.process(mixed[0], 0.0)
        rb = mix.process_window(mixed[1:], [1.0, 2.0, 3.0, 4.0], pad_to=4,
                                truncate_at_events=False)
        for x, y in zip(ra[1:], rb):
            assert x.success == y.success
            np.testing.assert_allclose(x.pose, y.pose, atol=1e-6)
