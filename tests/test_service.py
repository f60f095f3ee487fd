"""Tests for the HTTP tracking service (api/service.py, cli/rs_serve.py)."""

import threading

import numpy as np
import pytest

from realsensetracker_tpu.api import Tracker, TrackerConfig
from realsensetracker_tpu.api.service import (
    TrackingService,
    get_json,
    post_frame,
    post_window,
)
from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera

W, H = 80, 60
INTR = camera.Intrinsics(fx=64.0, fy=64.0, cx=(W - 1) / 2, cy=(H - 1) / 2,
                         width=W, height=H)


@pytest.fixture(scope="module")
def frames():
    depths, poses = synthetic.render_trajectory(INTR, 4, seed=0,
                                                step_scale=0.01)
    return [np.asarray(depths[i]) for i in range(4)], poses


@pytest.fixture()
def service():
    svc = TrackingService(
        lambda: Tracker(TrackerConfig(intrinsics=INTR, method="keyframe"))
    )
    yield svc
    svc.close()


class TestTrackingService:
    def test_track_sequence_and_trajectory(self, service, frames):
        depths, _ = frames
        url = f"http://127.0.0.1:{service.port}"
        recs = [post_frame(url, depths[i], ts=i / 30.0) for i in range(4)]
        assert [r["frame"] for r in recs] == [1, 2, 3, 4]
        assert all(r["success"] for r in recs)
        pose = np.asarray(recs[-1]["pose"])
        assert pose.shape == (4, 4)
        # Orthonormal rotation came back through JSON intact.
        R = pose[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)

        st = get_json(url, "/status")
        assert st["frames"] == 4 and st["tracker"] == "Tracker"
        latest = get_json(url, "/pose")
        np.testing.assert_allclose(np.asarray(latest["pose"]), pose,
                                   atol=1e-6)
        tum = get_json(url, "/trajectory")
        assert len(tum.strip().splitlines()) == 4
        assert len(tum.strip().splitlines()[0].split()) == 8

    def test_service_pose_matches_local_tracker(self, service, frames):
        depths, _ = frames
        url = f"http://127.0.0.1:{service.port}"
        for i in range(4):
            rec = post_frame(url, depths[i], ts=i / 30.0)
        local = Tracker(TrackerConfig(intrinsics=INTR, method="keyframe"))
        for i in range(4):
            res = local.process(depths[i], i / 30.0)
        np.testing.assert_allclose(
            np.asarray(rec["pose"]), np.asarray(res.pose), atol=1e-6
        )

    def test_reset(self, service, frames):
        depths, _ = frames
        url = f"http://127.0.0.1:{service.port}"
        post_frame(url, depths[0])
        import urllib.request

        with urllib.request.urlopen(
            urllib.request.Request(url + "/reset", data=b""), timeout=30
        ) as r:
            assert r.status == 200
        # The default session is gone; the next frame starts a fresh one.
        assert "default" not in get_json(url, "/status")["sessions"]
        rec = post_frame(url, depths[1])
        assert rec["frame"] == 1

    def test_independent_sessions(self, service, frames):
        depths, _ = frames
        url = f"http://127.0.0.1:{service.port}"
        a1 = post_frame(url, depths[0], ts=0.0, session="a")
        b1 = post_frame(url, depths[2], ts=0.0, session="b")
        a2 = post_frame(url, depths[1], ts=1 / 30.0, session="a")
        assert (a1["frame"], b1["frame"], a2["frame"]) == (1, 1, 2)
        st = get_json(url, "/status")
        assert st["sessions"]["a"]["frames"] == 2
        assert st["sessions"]["b"]["frames"] == 1
        # Session trajectories are independent.
        tum_a = get_json(url, "/trajectory?session=a")
        tum_b = get_json(url, "/trajectory?session=b")
        assert len(tum_a.strip().splitlines()) == 2
        assert len(tum_b.strip().splitlines()) == 1

    def test_bad_body_is_400_not_crash(self, service):
        import urllib.error
        import urllib.request

        url = f"http://127.0.0.1:{service.port}/track"
        req = urllib.request.Request(url, data=b"not an npy")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

    def test_concurrent_producers_serialize(self, frames):
        depths, _ = frames
        svc = TrackingService(
            lambda: Tracker(TrackerConfig(intrinsics=INTR, method="projective"))
        )
        try:
            url = f"http://127.0.0.1:{svc.port}"
            out = []
            def worker(i):
                out.append(post_frame(url, depths[i % 4], ts=float(i)))
            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(6)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert sorted(r["frame"] for r in out) == [1, 2, 3, 4, 5, 6]
            assert svc.status()["frames"] == 6
        finally:
            svc.close()


class TestServiceMethods:
    def test_slam_tracker_via_service(self, frames):
        from realsensetracker_tpu.tracking.slam import SlamConfig, SlamTracker

        depths, _ = frames
        svc = TrackingService(
            lambda: SlamTracker(SlamConfig(intrinsics=INTR))
        )
        try:
            url = f"http://127.0.0.1:{svc.port}"
            for i in range(4):
                rec = post_frame(url, depths[i], ts=i / 30.0)
            assert rec["frame"] == 4 and rec["success"]
            st = get_json(url, "/status")
            assert st["tracker"] == "SlamTracker" and st["keyframes"] >= 1
        finally:
            svc.close()

    def test_rgbd_npz_color_path(self):
        depths, colors, _ = synthetic.render_trajectory_rgbd(INTR, 3, seed=0)
        svc = TrackingService(
            lambda: Tracker(TrackerConfig(intrinsics=INTR, method="rgbd"))
        )
        try:
            url = f"http://127.0.0.1:{svc.port}"
            for i in range(3):
                rec = post_frame(url, np.asarray(depths[i]), ts=i / 30.0,
                                 color=np.asarray(colors[i]))
            assert rec["frame"] == 3 and rec["success"]
        finally:
            svc.close()

    def test_rgbd_without_color_is_500(self, frames):
        import urllib.error

        depths, _ = frames
        svc = TrackingService(
            lambda: Tracker(TrackerConfig(intrinsics=INTR, method="rgbd"))
        )
        try:
            url = f"http://127.0.0.1:{svc.port}"
            with pytest.raises(urllib.error.HTTPError) as ei:
                post_frame(url, depths[0])
            assert ei.value.code == 500
        finally:
            svc.close()


def _traj_poses(tum_text: str) -> np.ndarray:
    rows = [list(map(float, ln.split())) for ln in tum_text.strip().splitlines()]
    return np.asarray(rows)


class TestTrackWindow:
    def test_window_matches_per_frame(self):
        depths, _ = synthetic.render_trajectory(INTR, 10, seed=1,
                                                step_scale=0.01)
        depths = [np.asarray(d) for d in depths]
        mk = lambda: Tracker(TrackerConfig(intrinsics=INTR, method="keyframe"))
        svc_a, svc_b = TrackingService(mk), TrackingService(mk)
        try:
            ua = f"http://127.0.0.1:{svc_a.port}"
            ub = f"http://127.0.0.1:{svc_b.port}"
            recs_a = [post_frame(ua, d, ts=i / 30.0)
                      for i, d in enumerate(depths)]
            out = post_window(ub, np.stack(depths),
                              ts=np.arange(10) / 30.0, window=4)
            assert out["windowed"] is True
            recs_b = out["frames"]
            assert [r["frame"] for r in recs_b] == list(range(1, 11))
            assert all(r["success"] for r in recs_b)
            np.testing.assert_allclose(
                np.asarray(recs_a[-1]["pose"]),
                np.asarray(recs_b[-1]["pose"]), atol=1e-5,
            )
            np.testing.assert_allclose(
                _traj_poses(get_json(ua, "/trajectory")),
                _traj_poses(get_json(ub, "/trajectory")), atol=1e-5,
            )
        finally:
            svc_a.close()
            svc_b.close()

    def test_window_batches_continue_session(self, service, frames):
        depths, _ = frames
        url = f"http://127.0.0.1:{service.port}"
        out1 = post_window(url, np.stack(depths[:2]), window=2)
        out2 = post_window(url, np.stack(depths[2:]), window=2)
        got = [r["frame"] for r in out1["frames"] + out2["frames"]]
        assert got == [1, 2, 3, 4]
        assert get_json(url, "/status")["frames"] == 4

    def test_non_keyframe_method_falls_back_per_frame(self, frames):
        depths, _ = frames
        svc = TrackingService(
            lambda: Tracker(TrackerConfig(intrinsics=INTR,
                                          method="projective"))
        )
        try:
            url = f"http://127.0.0.1:{svc.port}"
            out = post_window(url, np.stack(depths))
            assert out["windowed"] is False
            assert [r["frame"] for r in out["frames"]] == [1, 2, 3, 4]
            assert all(r["success"] for r in out["frames"])
        finally:
            svc.close()

    def test_slam_tracker_window_via_service(self, frames):
        from realsensetracker_tpu.tracking.slam import SlamConfig, SlamTracker

        depths, _ = frames
        svc = TrackingService(lambda: SlamTracker(SlamConfig(intrinsics=INTR)))
        try:
            url = f"http://127.0.0.1:{svc.port}"
            out = post_window(url, np.stack(depths),
                              ts=np.arange(4) / 30.0, window=4)
            assert out["windowed"] is True
            assert [r["frame"] for r in out["frames"]] == [1, 2, 3, 4]
            assert get_json(url, "/status")["keyframes"] >= 1
        finally:
            svc.close()

    def test_window_decode_preserves_gray_dtype(self):
        """uint8 grays must reach the trackers unscaled so _as_gray's /255
        branch fires -- a float32 pre-cast would silently feed 0-255 values
        into the photometric term (parity break vs /track)."""
        import io as _io

        from realsensetracker_tpu.api import service as svc_mod

        g8 = (np.random.RandomState(0).rand(3, H, W) * 255).astype(np.uint8)
        d = np.ones((3, H, W), np.float32)
        buf = _io.BytesIO()
        np.savez(buf, depths=d, grays=g8)
        depths, grays, ts = svc_mod._decode_window(buf.getvalue())
        assert grays.dtype == np.uint8
        np.testing.assert_array_equal(grays, g8)
        assert depths.dtype == np.float32 and ts is None

    def test_window_zero_is_400(self, service, frames):
        import urllib.error

        depths, _ = frames
        url = f"http://127.0.0.1:{service.port}"
        with pytest.raises(urllib.error.HTTPError) as ei:
            post_window(url, np.stack(depths[:2]), window=0)
        assert ei.value.code == 400

    def test_midbatch_failure_resyncs_frame_counter(self):
        """A tracker failure mid-batch 500s, but frames consumed before it
        stay counted (frame numbers must keep matching /trajectory rows)."""
        import urllib.error

        class _Traj(list):
            def to_tum(self):
                return "\n".join("0 0 0 0 0 0 0 1" for _ in self)

        class _Result:
            pose = np.eye(4)
            success = True

        class _FlakyTracker:
            """Appends to its trajectory per frame; raises ONCE on frame 3."""

            def __init__(self):
                self.trajectory = _Traj()
                self.pose = np.eye(4)
                self._blew_up = False

            def process(self, depth, ts=None):
                if len(self.trajectory) == 2 and not self._blew_up:
                    self._blew_up = True
                    raise RuntimeError("mid-batch failure")
                self.trajectory.append(1)
                return _Result()

        svc = TrackingService(_FlakyTracker)
        try:
            url = f"http://127.0.0.1:{svc.port}"
            d = np.zeros((4, 8, 8), np.float32)
            with pytest.raises(urllib.error.HTTPError) as ei:
                post_window(url, d)  # no process_window -> per-frame loop
            assert ei.value.code == 500
            st = get_json(url, "/status")
            tum = get_json(url, "/trajectory")
            # 2 frames were consumed before the failure; counter matches.
            assert st["sessions"]["default"]["frames"] == 2
            assert len(tum.strip().splitlines()) == 2
            nxt = post_frame(url, d[0])
            assert nxt["frame"] == 3
        finally:
            svc.close()

    def test_bad_window_body_is_400(self, service):
        import urllib.error
        import urllib.request

        url = f"http://127.0.0.1:{service.port}/track_window"
        buf = np.asarray([1.0], np.float32)
        import io as _io

        b = _io.BytesIO()
        np.save(b, buf)  # .npy, not .npz -> 400
        req = urllib.request.Request(url, data=b.getvalue())
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400


class TestMetrics:
    def test_metrics_and_latency(self, service, frames):
        depths, _ = frames
        url = f"http://127.0.0.1:{service.port}"
        for i in range(3):
            post_frame(url, depths[i], ts=i / 30.0)
        st = get_json(url, "/status")
        lat = st["sessions"]["default"]["latency"]
        assert lat["count"] == 3
        assert lat["p50_ms"] > 0 and lat["p95_ms"] >= lat["p50_ms"]
        text = get_json(url, "/metrics")
        assert "rst_frames_total 3" in text
        assert 'rst_session_frames{session="default"} 3' in text
        assert 'rst_track_ms{session="default",stat="p50"}' in text

    def test_prometheus_label_escaping(self):
        from realsensetracker_tpu.api import service as svc_mod

        assert svc_mod._plabel('a"b\\c') == 'a\\"b\\\\c'
        assert svc_mod._plabel("plain") == "plain"


class TestServeCli:
    def test_serves_until_max_frames(self, frames, capsys):
        depths, _ = frames
        from realsensetracker_tpu.cli import rs_serve

        rc_holder = {}

        def run():
            rc_holder["rc"] = rs_serve.main([
                "--method", "keyframe", "--width", str(W), "--height", str(H),
                "--fx", "64", "--max-frames", "2",
            ])

        t = threading.Thread(target=run)
        t.start()
        # Find the port from the startup line.
        import re
        import time

        port = None
        for _ in range(100):
            out = capsys.readouterr().out
            m = re.search(r"http://127\.0\.0\.1:(\d+)/", out)
            if m:
                port = int(m.group(1))
                break
            time.sleep(0.1)
        assert port, "service did not start"
        url = f"http://127.0.0.1:{port}"
        post_frame(url, depths[0], ts=0.0)
        post_frame(url, depths[1], ts=1 / 30.0)
        t.join(timeout=60)
        assert not t.is_alive() and rc_holder["rc"] == 0
        assert "served 2 frames" in capsys.readouterr().out


class TestTsdfService:
    """method='tsdf' through the service: dense frame-to-model tracking
    as an endpoint, per-frame and scanned-window, same trajectory."""

    def _mk(self):
        from realsensetracker_tpu.align.projective import ProjectiveIcpConfig
        from realsensetracker_tpu.mapping.tsdf import TsdfConfig

        return lambda: Tracker(TrackerConfig(
            intrinsics=INTR, method="tsdf",
            tsdf=TsdfConfig(
                resolution=64, voxel_size=0.1, origin=(-3.2, -2.4, -0.3),
                trunc=0.3, max_range=5.0,
            ),
            projective=ProjectiveIcpConfig(
                iters=(3, 3), inner_iters=2, samples=768, min_samples=192
            ),
        ))

    def test_tsdf_window_matches_per_frame(self):
        depths, _ = synthetic.render_trajectory(
            INTR, 7, scene=synthetic.default_scene(seed=3), seed=1,
            step_scale=0.01,
        )
        depths = [np.asarray(d) for d in depths]
        mk = self._mk()
        svc_a, svc_b = TrackingService(mk), TrackingService(mk)
        try:
            ua = f"http://127.0.0.1:{svc_a.port}"
            ub = f"http://127.0.0.1:{svc_b.port}"
            recs_a = [post_frame(ua, d, ts=i / 30.0)
                      for i, d in enumerate(depths)]
            out = post_window(ub, np.stack(depths),
                              ts=np.arange(7) / 30.0, window=3)
            assert out["windowed"] is True
            recs_b = out["frames"]
            assert all(r["success"] for r in recs_b)
            np.testing.assert_allclose(
                np.asarray(recs_a[-1]["pose"]),
                np.asarray(recs_b[-1]["pose"]), atol=1e-5,
            )
        finally:
            svc_a.close()
            svc_b.close()


class TestRawU16:
    """Raw uint16 depth bodies: half the f32 bytes over HTTP and into the
    device; api.Tracker converts via config.depth_scale (on device for
    method='keyframe'), non-raw trackers (SLAM) get host-converted
    meters at the service's depth_scale."""

    def test_u16_matches_f32_keyframe(self, frames):
        depths, _ = frames
        scale = 1.0 / 5000.0
        raw = [np.asarray(np.asarray(d) * 5000.0 + 0.5, np.uint16)
               for d in depths]
        quant = [r.astype(np.float32) * np.float32(scale) for r in raw]
        mk = lambda: Tracker(TrackerConfig(
            intrinsics=INTR, method="keyframe", depth_scale=scale))
        a = TrackingService(mk, depth_scale=scale)
        b = TrackingService(mk, depth_scale=scale)
        try:
            ra = [post_frame(f"http://127.0.0.1:{a.port}", d, ts=i / 30.0)
                  for i, d in enumerate(quant)]
            rb = [post_frame(f"http://127.0.0.1:{b.port}", d, ts=i / 30.0)
                  for i, d in enumerate(raw)]
            for x, y in zip(ra, rb):
                assert x["success"] == y["success"]
                np.testing.assert_allclose(x["pose"], y["pose"], atol=1e-5)
        finally:
            a.close()
            b.close()

    def test_u16_window_and_slam_host_conversion(self, frames):
        depths, _ = frames
        scale = 1.0 / 5000.0
        raw = np.stack([np.asarray(np.asarray(d) * 5000.0 + 0.5, np.uint16)
                        for d in depths])
        # keyframe windowed path: raw u16 through the scanned window
        svc = TrackingService(
            lambda: Tracker(TrackerConfig(intrinsics=INTR,
                                          method="keyframe",
                                          depth_scale=scale)),
            depth_scale=scale,
        )
        try:
            rec = post_window(f"http://127.0.0.1:{svc.port}", raw,
                              ts=[i / 30.0 for i in range(4)], window=4)
            assert rec["windowed"]
            assert [f["success"] for f in rec["frames"]] == [True] * 4
        finally:
            svc.close()
        # SLAM accepts raw depth, but its config keeps the 1e-3 default
        # scale while the service runs 1/5000: the scale-mismatch guard
        # must host-convert to meters instead of passing raw through.
        from realsensetracker_tpu.tracking.slam import SlamConfig, SlamTracker

        svc2 = TrackingService(
            lambda: SlamTracker(SlamConfig(intrinsics=INTR)),
            depth_scale=scale,
        )
        try:
            recs = [post_frame(f"http://127.0.0.1:{svc2.port}", raw[i],
                               ts=i / 30.0) for i in range(4)]
            assert all(r["success"] for r in recs)
        finally:
            svc2.close()
