"""Best-effort reference .pb cloud interop (data.pb_interop).

The reference's recorded clips are external-schema protobuf PointClouds
(rs_viewer.cpp:105-112 -> rs_replay_app.cpp:219-225); the reader is
schema-free, so these tests exercise it against several plausible wire
layouts, not just our own writer's field numbers."""

import struct

import numpy as np
import pytest

from realsensetracker_tpu.data import pb_interop


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    return _varint(field << 3) + _varint(value)


def _pts(n=50, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(n, 3).astype(np.float32)


class TestSchemaFreeParse:
    def test_roundtrip_own_writer(self, tmp_path):
        pts = _pts()
        cols = np.random.RandomState(1).rand(50, 3).astype(np.float32)
        path = str(tmp_path / "cloud.pb")
        pb_interop.write_pb_cloud(path, pts, cols)
        got_pts, got_cols = pb_interop.read_pb_cloud(path)
        np.testing.assert_array_equal(got_pts, pts)
        np.testing.assert_allclose(got_cols, cols, atol=1e-6)

    def test_flat_layout(self):
        # Layout A: top-level packed data field + scalar metadata.
        pts = _pts(33, seed=2)
        msg = _vi(1, 3) + _ld(4, pts.reshape(-1).tobytes()) + _vi(7, 33)
        got, cols = pb_interop.parse_pb_cloud(msg)
        np.testing.assert_array_equal(got, pts)
        assert cols is None

    def test_deeply_nested_layout(self):
        # Layout B: cloud inside header inside wrapper (unknown numbers).
        pts = _pts(21, seed=3)
        inner = _ld(11, pts.reshape(-1).tobytes())
        mid = _vi(1, 0) + _ld(2, inner)
        msg = _ld(5, mid) + _ld(9, b"some-name")
        got, _ = pb_interop.parse_pb_cloud(msg)
        np.testing.assert_array_equal(got, pts)

    def test_colors_detected_by_range(self):
        pts = 10.0 * _pts(24, seed=4)  # geometric scale, outside [0, 1]
        cols = np.random.RandomState(5).rand(24, 3).astype(np.float32)
        msg = _ld(2, pts.reshape(-1).tobytes()) + _ld(3, cols.reshape(-1).tobytes())
        got_pts, got_cols = pb_interop.parse_pb_cloud(msg)
        np.testing.assert_array_equal(got_pts, pts)
        np.testing.assert_allclose(got_cols, cols, atol=1e-6)

    def test_fixed_fields_skipped(self):
        pts = _pts(12, seed=6)
        msg = (
            _varint((3 << 3) | 1) + struct.pack("<d", 1.5)  # fixed64
            + _varint((4 << 3) | 5) + struct.pack("<f", 2.5)  # fixed32
            + _ld(6, pts.reshape(-1).tobytes())
        )
        got, _ = pb_interop.parse_pb_cloud(msg)
        np.testing.assert_array_equal(got, pts)

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            pb_interop.parse_pb_cloud(b"\xff\xff\xff\xff not a proto")
        with pytest.raises(ValueError):
            pb_interop.parse_pb_cloud(_ld(1, b"tiny"))


class TestCliIntegration:
    def test_rs_align_reads_pb_pair(self, tmp_path):
        import jax.numpy as jnp

        from realsensetracker_tpu.cli import rs_align
        from realsensetracker_tpu.geometry import se3

        rng = np.random.RandomState(7)
        src = rng.randn(400, 3).astype(np.float32)
        T = np.asarray(
            se3.exp(jnp.asarray([0.02, -0.01, 0.02, 0.02, -0.01, 0.02], jnp.float32))
        )
        dst = src @ T[:3, :3].T + T[:3, 3]
        a, b = str(tmp_path / "a.pb"), str(tmp_path / "b.pb")
        pb_interop.write_pb_cloud(a, src)
        pb_interop.write_pb_cloud(b, dst)
        rc = rs_align.main([
            "--source-file", a, "--target-file", b, "--capacity", "512",
            "--init-with-fpfh", "0",
        ])
        assert rc == 0

    def test_view_clouds_renders_pb(self, tmp_path):
        import os

        from realsensetracker_tpu.cli import view_clouds

        pts = _pts(30, seed=8)
        cols = np.random.RandomState(9).rand(30, 3).astype(np.float32)
        pb_interop.write_pb_cloud(str(tmp_path / "0000.pb"), pts, cols)
        out = str(tmp_path / "views")
        rc = view_clouds.main([
            "--pattern", str(tmp_path / "{:04d}.pb"), "--frames", "2",
            "--out-dir", out,
        ])
        assert rc == 0
        assert os.path.exists(os.path.join(out, "view_0000.png"))
