"""Native C++ layer tests: clip codec, PNG16 decoder, voxel map.

Skipped entirely when a toolchain is unavailable (the library builds on
demand via cmake+make).
"""

import os

import numpy as np
import pytest

try:
    from realsensetracker_tpu import native
    native.load()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")


class TestClipCodec:
    def test_native_matches_python_reader(self, tmp_path):
        from realsensetracker_tpu.data import recorded
        from realsensetracker_tpu.geometry import camera
        from realsensetracker_tpu.native import clip_io

        path = os.path.join(tmp_path, "c.rsc")
        depths = np.random.RandomState(0).rand(4, 24, 32).astype(np.float32) * 3
        stamps = np.arange(4, dtype=np.float64) * 0.1
        intr = camera.Intrinsics(20.0, 21.0, 15.5, 11.5, 32, 24)
        recorded.write_clip(path, depths, stamps, intr)

        py = recorded.read_clip_py(path)
        nat = clip_io.read_clip(path)
        np.testing.assert_array_equal(nat.depths, py.depths)
        np.testing.assert_array_equal(nat.timestamps, py.timestamps)
        assert nat.intrinsics == py.intrinsics

    def test_native_writer_roundtrip(self, tmp_path):
        from realsensetracker_tpu.data import recorded
        from realsensetracker_tpu.geometry import camera
        from realsensetracker_tpu.native import clip_io

        path = os.path.join(tmp_path, "n.rsc")
        depths = np.random.RandomState(1).rand(2, 16, 16).astype(np.float32)
        stamps = np.array([0.0, 0.5])
        intr = camera.Intrinsics(10.0, 10.0, 7.5, 7.5, 16, 16)
        clip_io.write_clip(path, depths, stamps, intr)
        clip = recorded.read_clip_py(path)
        np.testing.assert_allclose(clip.depths, depths, atol=6e-4)

    def test_bad_file_raises(self, tmp_path):
        from realsensetracker_tpu.native import clip_io

        p = os.path.join(tmp_path, "junk.rsc")
        open(p, "wb").write(b"garbage")
        with pytest.raises(ValueError):
            clip_io.read_clip(p)

    def test_native_writer_scales_float_colors(self, tmp_path):
        """Float [0,1] colors must scale by 255 exactly like the Python
        writer (a plain uint8 cast truncated them to 0/1, flattening the
        photometric plane)."""
        from realsensetracker_tpu.data import recorded
        from realsensetracker_tpu.geometry import camera
        from realsensetracker_tpu.native import clip_io

        intr = camera.Intrinsics(10.0, 10.0, 7.5, 7.5, 16, 16)
        depths = np.ones((2, 16, 16), np.float32)
        stamps = np.array([0.0, 0.5])
        colors = np.full((2, 16, 16, 3), 0.5, np.float32)
        p_nat = os.path.join(tmp_path, "nat.rsc")
        p_py = os.path.join(tmp_path, "py.rsc")
        clip_io.write_clip(p_nat, depths, stamps, intr, colors=colors)
        recorded.write_clip(p_py, depths, stamps, intr, colors=colors)
        c_nat = recorded.read_clip_py(p_nat).colors
        c_py = recorded.read_clip_py(p_py).colors
        np.testing.assert_array_equal(c_nat, c_py)
        assert c_nat.max() > 100  # scaled, not truncated to 0/1


class TestPng16:
    @pytest.mark.parametrize("dtype,scale", [(np.uint16, 65535), (np.uint8, 255)])
    def test_decode_matches_pil(self, tmp_path, dtype, scale):
        from PIL import Image

        from realsensetracker_tpu.native import png_io

        rng = np.random.RandomState(2)
        arr = (rng.rand(37, 53) * scale).astype(dtype)
        p = os.path.join(tmp_path, "x.png")
        Image.fromarray(arr).save(p)
        got = png_io.read_png16(p)
        np.testing.assert_array_equal(got, arr.astype(np.uint16))

    def test_batch_decode_matches_single(self, tmp_path):
        from PIL import Image

        from realsensetracker_tpu.native import png_io

        rng = np.random.RandomState(3)
        paths, arrs = [], []
        for i in range(5):
            arr = (rng.rand(24, 31) * 65535).astype(np.uint16)
            p = os.path.join(tmp_path, f"b{i}.png")
            Image.fromarray(arr).save(p)
            paths.append(p)
            arrs.append(arr)
        got = png_io.read_png16_batch(paths, 24, 31)
        np.testing.assert_array_equal(got, np.stack(arrs))
        # f32 meters conversion bit-matches the per-frame path.
        got_f = png_io.read_png16_batch(paths, 24, 31, scale=5000.0)
        np.testing.assert_array_equal(
            got_f, np.stack(arrs).astype(np.float32) / 5000.0
        )

    def test_batch_decode_reports_bad_file(self, tmp_path):
        from PIL import Image

        from realsensetracker_tpu.native import png_io

        arr = np.zeros((8, 8), np.uint16)
        good = os.path.join(tmp_path, "g.png")
        Image.fromarray(arr).save(good)
        bad = os.path.join(tmp_path, "bad.png")
        open(bad, "wb").write(b"nonsense")
        with pytest.raises(ValueError, match="bad.png"):
            png_io.read_png16_batch([good, bad], 8, 8)

    def test_batch_decode_rejects_mixed_resolutions(self, tmp_path):
        """A file LARGER than the caller-assumed dims used to write past
        its fixed-stride slot (heap overflow); the sized decode must fail
        with a per-file error instead."""
        from PIL import Image

        from realsensetracker_tpu.native import png_io

        small = (np.ones((8, 8)) * 7).astype(np.uint16)
        big = (np.ones((16, 16)) * 9).astype(np.uint16)
        ps = os.path.join(tmp_path, "small.png")
        pb = os.path.join(tmp_path, "big.png")
        Image.fromarray(small).save(ps)
        Image.fromarray(big).save(pb)
        with pytest.raises(ValueError, match="big.png"):
            png_io.read_png16_batch([ps, pb], 8, 8)

    def test_tum_batch_loader_matches_per_frame(self, tmp_path):
        from realsensetracker_tpu.data import tum

        root = os.path.join(tmp_path, "seq")
        tum.synthesize_tum_sequence(root, num_frames=6)
        seq = tum.TumSequence.open(root)
        block = seq.load_depth_batch(range(6))
        singles = np.stack([seq.depth(i) for i in range(6)])
        np.testing.assert_array_equal(block, singles)
        # frames() batching yields the same stream as per-frame decoding.
        a = [(t, d.copy()) for t, d in seq.frames(batch_decode=4)]
        b = [(t, d) for t, d in seq.frames(batch_decode=1)]
        assert len(a) == len(b) == 6
        for (ta, da), (tb, db) in zip(a, b):
            assert ta == tb
            np.testing.assert_array_equal(da, db)

    def test_tum_loader_uses_native(self, tmp_path):
        from PIL import Image

        from realsensetracker_tpu.data import tum

        arr = (np.ones((8, 8)) * 5000).astype(np.uint16)
        p = os.path.join(tmp_path, "d.png")
        Image.fromarray(arr).save(p)
        d = tum.load_depth_png(p)
        np.testing.assert_allclose(d, 1.0)


class TestNativeVoxelMap:
    def test_first_insert_wins_and_transform(self):
        from realsensetracker_tpu.native.voxel_map import NativeVoxelMap

        m = NativeVoxelMap(0.05)
        eye = np.eye(4, dtype=np.float32)
        m.add_cloud(eye, np.array([[0.01, 0.01, 0.01]], np.float32))
        m.add_cloud(eye, np.array([[0.03, 0.03, 0.03]], np.float32))  # same voxel
        assert len(m) == 1
        np.testing.assert_allclose(m.extract(), [[0.01, 0.01, 0.01]], atol=1e-6)

        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [1.0, 0, 0]
        m.add_cloud(T, np.array([[0.2, 0.2, 0.2]], np.float32))
        assert len(m) == 2
        pts = m.extract()
        assert any(np.allclose(p, [1.2, 0.2, 0.2], atol=1e-6) for p in pts)

    def test_matches_python_accumulator(self):
        import jax.numpy as jnp

        from realsensetracker_tpu.native.voxel_map import NativeVoxelMap
        from realsensetracker_tpu.ops import cloud as cloud_mod
        from realsensetracker_tpu.tracking import accumulator as acc_mod

        rng = np.random.RandomState(3)
        pts = rng.rand(200, 3).astype(np.float32)
        nat = NativeVoxelMap(0.1)
        nat.add_cloud(np.eye(4, dtype=np.float32), pts)

        acc = acc_mod.init_map(512)
        acc = acc_mod.add_cloud(
            acc, jnp.eye(4), cloud_mod.from_points(jnp.asarray(pts)), 0.1
        )
        got = np.asarray(acc.points)[np.asarray(acc.mask)]
        # Identity transform is exact in f32: compare bit-exact.
        a = set(map(tuple, np.asarray(nat.extract(), np.float32).tolist()))
        b = set(map(tuple, np.asarray(got, np.float32).tolist()))
        assert a == b
