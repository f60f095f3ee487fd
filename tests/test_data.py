"""Data-layer tests: clip record/replay, TUM loading, streaming, sources."""

import os

import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.data import random_source, recorded, stream, synthetic, tum
from realsensetracker_tpu.geometry import camera


class TestClipFormat:
    def test_roundtrip_u16(self, tmp_path):
        path = os.path.join(tmp_path, "c.rsc")
        depths = np.random.RandomState(0).rand(3, 32, 40).astype(np.float32) * 4
        stamps = np.array([0.0, 0.1, 0.2])
        intr = camera.Intrinsics(30.0, 30.0, 19.5, 15.5, 40, 32)
        recorded.write_clip(path, depths, stamps, intr)
        clip = recorded.read_clip_py(path)
        assert len(clip) == 3
        np.testing.assert_allclose(clip.timestamps, stamps)
        # u16 millimeters: 0.5mm quantization
        np.testing.assert_allclose(clip.depths, depths, atol=6e-4)
        assert clip.intrinsics.width == 40

    def test_roundtrip_f32(self, tmp_path):
        path = os.path.join(tmp_path, "c.rsc")
        depths = np.random.RandomState(1).rand(2, 16, 16).astype(np.float32)
        intr = camera.Intrinsics(10.0, 10.0, 7.5, 7.5, 16, 16)
        recorded.write_clip(path, depths, [0.0, 1.0], intr, dtype=recorded.DTYPE_F32_M)
        clip = recorded.read_clip_py(path)
        np.testing.assert_array_equal(clip.depths, depths)

    def test_bad_magic_rejected(self, tmp_path):
        path = os.path.join(tmp_path, "bad.rsc")
        with open(path, "wb") as f:
            f.write(b"NOTACLIP" + b"\0" * 64)
        try:
            recorded.read_clip_py(path)
            assert False, "should raise"
        except ValueError:
            pass

    def test_synthetic_record(self, tmp_path):
        path = os.path.join(tmp_path, "syn.rsc")
        clip = recorded.record_synthetic_clip(path, num_frames=3, width=64, height=48)
        assert len(clip) == 3
        assert clip.depths.shape == (3, 48, 64)
        assert np.isfinite(clip.depths).all()


class TestTum:
    def test_synthesized_sequence_roundtrip(self, tmp_path):
        root = tum.synthesize_tum_sequence(str(tmp_path), num_frames=4, width=64, height=48)
        seq = tum.TumSequence.open(root)
        assert len(seq) == 4
        d = seq.depth(0)
        assert d.shape == (48, 64)
        assert d.max() > 0.5  # meters scale restored
        gt = seq.groundtruth_trajectory()
        assert len(gt) == 4

    def test_depth_png_scale(self, tmp_path):
        from PIL import Image

        arr = (np.ones((8, 8)) * 5000).astype(np.uint16)  # 1 meter
        p = os.path.join(tmp_path, "d.png")
        Image.fromarray(arr).save(p)
        d = tum.load_depth_png(p)
        np.testing.assert_allclose(d, 1.0)


class TestStream:
    def test_prefetch_order_preserved(self):
        src = [(float(i), np.full((4, 4), i, np.float32)) for i in range(10)]
        fs = stream.FrameStream(iter(src), prefetch=3)
        got = [(ts, float(np.asarray(d)[0, 0])) for ts, d in fs]
        assert got == [(float(i), float(i)) for i in range(10)]

    def test_stream_clip(self, tmp_path):
        path = os.path.join(tmp_path, "c.rsc")
        clip = recorded.record_synthetic_clip(path, num_frames=3, width=32, height=24)
        frames = list(stream.stream_clip(clip))
        assert len(frames) == 3

    def test_producer_error_propagates(self):
        """A corrupt frame mid-sequence must NOT look like a clean end of
        stream (a replay would otherwise 'complete' -- and score ATE -- on
        a silently truncated sequence)."""
        import pytest

        def src():
            yield 0.0, np.zeros((4, 4), np.float32)
            yield 1.0, np.zeros((4, 4), np.float32)
            raise IOError("corrupt frame 2")

        fs = stream.FrameStream(src(), prefetch=2)
        got = []
        with pytest.raises(RuntimeError, match="producer failed"):
            for ts, d in fs:
                got.append(ts)
        assert got == [0.0, 1.0]

    def test_reiteration_raises_instead_of_hanging(self):
        import pytest

        src = [(float(i), np.zeros((2, 2), np.float32)) for i in range(3)]
        fs = stream.FrameStream(iter(src))
        assert len(list(fs)) == 3
        with pytest.raises(RuntimeError, match="single-pass"):
            list(fs)

    def test_close_unblocks_producer(self):
        import threading
        import time

        src = ((float(i), np.zeros((2, 2), np.float32)) for i in range(100))
        with stream.FrameStream(src, prefetch=1) as fs:
            it = iter(fs)
            next(it)  # start the producer; queue fills and put() blocks
            time.sleep(0.1)
        # close() ran: the producer thread must have exited.
        deadline = time.time() + 5.0
        while fs._thread.is_alive() and time.time() < deadline:
            time.sleep(0.05)
        assert not fs._thread.is_alive()
        assert threading.active_count() < 50  # no thread leak build-up


class TestRandomSources:
    def test_random_cloud_source(self):
        src = random_source.RandomCloudSource(size=64, timestep=0.5)
        c, ts = src.get_cloud(1.0)
        assert ts == 1.5
        assert c.capacity == 64
        pts = np.asarray(c.points)
        assert pts.min() >= -1.0 and pts.max() <= 1.0

    def test_random_depth_source(self):
        src = random_source.RandomDepthSource(
            intr=camera.Intrinsics(30.0, 30.0, 15.5, 11.5, 32, 32)
        )
        d, ts = src.get_depth(0.0)
        assert d.shape == (32, 32)
        assert float(jnp.min(d)) >= 0.9


class TestSyntheticScene:
    def test_depth_positive_and_bounded(self):
        intr = camera.Intrinsics(40.0, 40.0, 19.5, 14.5, 40, 30)
        d = synthetic.render_depth(intr, jnp.eye(4), synthetic.default_scene())
        arr = np.asarray(d)
        assert (arr[arr > 0] < 50).all()
        assert (arr > 0).mean() > 0.9  # wall+floor fill most of the view
