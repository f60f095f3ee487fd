"""Cross-session dynamic batching (api/batching.py + step_streams_masked).

The serving shape the reference never had: many producers, one chip.
`step_streams_masked` must (a) leave inactive slots bit-identical, (b)
seed first frames at identity, and (c) match the always-on `step_streams`
when every slot is active — so batching NEVER changes any session's
trajectory, it only changes how many sessions share one dispatch.
"""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from realsensetracker_tpu.align import projective, rgbd as rgbd_align
from realsensetracker_tpu.api.batching import (
    BatchedExecutor,
    BatchingConfig,
    SessionDesyncError,
)
from realsensetracker_tpu.api.service import (
    TrackingService,
    get_json,
    post_frame,
    post_window,
)
from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.parallel import streams

INTR = camera.Intrinsics(fx=100.0, fy=100.0, cx=49.5, cy=37.0,
                         width=100, height=75)
CFG = projective.ProjectiveIcpConfig(iters=(5, 5, 6), samples=1024)
S = 3
F = 4


@pytest.fixture(scope="module")
def stream_data():
    """(F, S, H, W): S independent trajectories through different scenes."""
    all_depths = []
    for i in range(S):
        scene = synthetic.default_scene(seed=20 + i)
        d, _ = synthetic.render_trajectory(INTR, F, scene=scene, seed=i,
                                           step_scale=0.015)
        all_depths.append(np.asarray(d, np.float32))
    return np.stack(all_depths, 1)


def _aligned_reference(stream_data, frames):
    """Every slot advanced `frames` frames via the always-on step."""
    ref = streams.init_streams(jnp.asarray(stream_data[0]), INTR, CFG)
    for f in range(1, frames):
        ref, _ = streams.step_streams(ref, jnp.asarray(stream_data[f]),
                                      INTR, CFG)
    return ref


class TestMaskedStep:
    def test_all_active_matches_step_streams(self, stream_data):
        ref = streams.init_streams(jnp.asarray(stream_data[0]), INTR, CFG)
        msk = streams.init_streams(jnp.asarray(stream_data[0]), INTR, CFG)
        active = jnp.ones((S,), bool)
        seed = jnp.zeros((S,), bool)
        for f in range(1, F):
            ref, r = streams.step_streams(ref, jnp.asarray(stream_data[f]),
                                          INTR, CFG)
            msk, stats = streams.step_streams_masked(
                msk, jnp.asarray(stream_data[f]), active, seed, INTR, CFG
            )
            stats = np.asarray(stats)
            assert stats.shape == (S, streams.MASKED_STATS_WIDTH)
            np.testing.assert_allclose(
                np.asarray(msk.poses), np.asarray(ref.poses), atol=1e-5
            )
            np.testing.assert_allclose(
                stats[:, :16].reshape(S, 4, 4), np.asarray(ref.poses),
                atol=1e-5,
            )
            np.testing.assert_array_equal(
                stats[:, 32] > 0.5, np.asarray(r.success)
            )

    def test_staggered_seeding_matches_aligned_run(self, stream_data):
        """Slot i joins at round i (its frame 0 seeds); the final state must
        equal the aligned all-active run — WHEN frames arrive must not
        change WHAT each slot computes."""
        eye = np.eye(4, dtype=np.float32)
        state = streams.blank_streams(INTR, CFG, num_streams=S)
        for r in range(F + S - 1):
            depths = np.zeros((S,) + stream_data.shape[2:], np.float32)
            active = np.zeros((S,), bool)
            seed = np.zeros((S,), bool)
            for i in range(S):
                f = r - i
                if 0 <= f < F:
                    depths[i] = stream_data[f, i]
                    active[i] = True
                    seed[i] = f == 0
            prev_poses = np.asarray(state.poses)
            prev_count = np.asarray(state.frame_count)
            state, stats = streams.step_streams_masked(
                state, jnp.asarray(depths), jnp.asarray(active),
                jnp.asarray(seed), INTR, CFG,
            )
            stats = np.asarray(stats)
            poses = np.asarray(state.poses)
            count = np.asarray(state.frame_count)
            for i in range(S):
                f = r - i
                if f == 0:  # seed row: identity pose/relative, clean stats
                    np.testing.assert_array_equal(
                        stats[i, :16].reshape(4, 4), eye
                    )
                    np.testing.assert_array_equal(
                        stats[i, 16:32].reshape(4, 4), eye
                    )
                    assert stats[i, 32] > 0.5  # success
                    assert stats[i, 33] == 0.0 and stats[i, 34] == 1.0
                elif not (0 <= f < F):  # inactive slot: untouched
                    assert stats[i, 32] < 0.5
                    np.testing.assert_array_equal(poses[i], prev_poses[i])
                    assert count[i] == prev_count[i]
                else:
                    assert count[i] == prev_count[i] + 1
        ref = _aligned_reference(stream_data, F)
        np.testing.assert_allclose(
            np.asarray(state.poses), np.asarray(ref.poses), atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(state.frame_count), F)
        assert bool(jnp.all(state.initialized))

    def test_window_scan_matches_sequential_masked_steps(self, stream_data):
        """step_streams_masked_window == W sequential masked steps, with a
        ragged active pattern (slot i carries i+1 frames, slot 2 seeds)."""
        W = 3
        state_a = streams.init_streams(jnp.asarray(stream_data[0]), INTR, CFG)
        state_b = streams.init_streams(jnp.asarray(stream_data[0]), INTR, CFG)
        depths = np.zeros((S, W) + stream_data.shape[2:], np.float32)
        active = np.zeros((S, W), bool)
        seed = np.zeros((S, W), bool)
        for i in range(S):
            n = i + 1
            depths[i, :n] = stream_data[1 : 1 + n, i]
            active[i, :n] = True
        seed[2, 0] = True  # slot 2's request reseeds it
        state_a, stats_a = streams.step_streams_masked_window(
            state_a, jnp.asarray(depths), jnp.asarray(active),
            jnp.asarray(seed), INTR, CFG,
        )
        per_frame = []
        for j in range(W):
            state_b, st = streams.step_streams_masked(
                state_b, jnp.asarray(depths[:, j]),
                jnp.asarray(active[:, j]), jnp.asarray(seed[:, j]),
                INTR, CFG,
            )
            per_frame.append(np.asarray(st))
        stats_a = np.asarray(stats_a)
        assert stats_a.shape == (S, W, streams.MASKED_STATS_WIDTH)
        np.testing.assert_allclose(
            stats_a, np.stack(per_frame, 1), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(state_a.poses), np.asarray(state_b.poses), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(state_a.frame_count), np.asarray(state_b.frame_count)
        )

    def test_random_activity_matches_per_slot_replay(self, stream_data):
        """Fuzz the serving reality: sessions join late, skip rounds, and
        resume. Whatever the activity pattern, each slot's final state must
        equal replaying ONLY its own frames through an all-active run of
        its own lane (batching never changes what a session computes)."""
        rng = np.random.default_rng(7)
        state = streams.blank_streams(INTR, CFG, num_streams=S)
        next_frame = np.zeros(S, int)  # per-slot frames consumed so far
        rounds = 0
        while (next_frame < F).any():
            rounds += 1
            depths = np.zeros((S,) + stream_data.shape[2:], np.float32)
            active = np.zeros((S,), bool)
            seed = np.zeros((S,), bool)
            for i in range(S):
                if next_frame[i] < F and rng.random() < 0.6:
                    depths[i] = stream_data[next_frame[i], i]
                    active[i] = True
                    seed[i] = next_frame[i] == 0
                    next_frame[i] += 1
            state, _ = streams.step_streams_masked(
                state, jnp.asarray(depths), jnp.asarray(active),
                jnp.asarray(seed), INTR, CFG,
            )
        assert rounds > F  # gaps actually happened
        ref = _aligned_reference(stream_data, F)
        np.testing.assert_allclose(
            np.asarray(state.poses), np.asarray(ref.poses), atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(state.frame_count), F)

    def test_reseed_resets_a_live_slot(self, stream_data):
        """seed=True on an initialized slot restarts it at identity (slot
        reuse: a released session's slot is handed to a new session)."""
        state = streams.init_streams(jnp.asarray(stream_data[0]), INTR, CFG)
        state, _ = streams.step_streams_masked(
            state, jnp.asarray(stream_data[1]),
            jnp.ones((S,), bool), jnp.zeros((S,), bool), INTR, CFG,
        )
        moved = np.asarray(state.poses)
        assert not np.allclose(moved[0], np.eye(4), atol=1e-6)
        seed = jnp.asarray([True, False, False])
        state, _ = streams.step_streams_masked(
            state, jnp.asarray(stream_data[2]),
            jnp.ones((S,), bool), seed, INTR, CFG,
        )
        poses = np.asarray(state.poses)
        np.testing.assert_array_equal(poses[0], np.eye(4, dtype=np.float32))
        assert not np.allclose(poses[1], moved[1], atol=1e-9)  # kept moving


class TestBatchedExecutor:
    def test_concurrent_sessions_coalesce_and_match(self, stream_data):
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=INTR, icp=CFG, capacity=S, linger_ms=150.0,
        ))
        try:
            trackers = [ex.make_session_tracker() for _ in range(S)]
            barrier = threading.Barrier(S)
            results = [[] for _ in range(S)]
            errors = []

            def worker(i):
                try:
                    for f in range(F):
                        barrier.wait()
                        results[i].append(
                            trackers[i].process(stream_data[f, i], float(f))
                        )
                except BaseException as e:  # pragma: no cover - diagnostics
                    errors.append(e)

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(S)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert not errors
            ref = _aligned_reference(stream_data, F)
            for i in range(S):
                assert [r.frame_index for r in results[i]] == list(range(F))
                assert all(r.success for r in results[i])
                np.testing.assert_allclose(
                    results[i][-1].pose, np.asarray(ref.poses[i]), atol=1e-5
                )
                assert len(trackers[i].trajectory) == F
            st = ex.stats()
            assert st["frames"] == S * F
            assert st["active_sessions"] == S
            # Coalescing actually happened: fewer dispatches than frames,
            # and at least one round carried 2+ sessions' frames.
            assert st["dispatches"] < S * F
            assert st["max_batch"] >= 2
            assert st["mean_batch"] == round(st["frames"] / st["dispatches"], 3)
        finally:
            ex.close()

    def test_slot_lifecycle_capacity_release_reseed(self, stream_data):
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=INTR, icp=CFG, capacity=1,
        ))
        try:
            t1 = ex.make_session_tracker()
            with pytest.raises(RuntimeError, match="capacity"):
                ex.make_session_tracker()
            with pytest.raises(ValueError, match="shape"):
                t1.process(np.zeros((8, 8), np.float32))
            r0 = t1.process(stream_data[0, 0], 0.0)
            r1 = t1.process(stream_data[1, 0], 1.0)
            assert r0.success and r1.success
            np.testing.assert_array_equal(r0.pose, np.eye(4))
            assert not np.allclose(r1.pose, np.eye(4), atol=1e-6)
            t1.release()
            t1.release()  # idempotent
            t2 = ex.make_session_tracker()  # reuses the freed slot...
            r = t2.process(stream_data[0, 1], 0.0)
            np.testing.assert_array_equal(r.pose, np.eye(4))  # ...reseeded
            # The STALE facade must not write into the reacquired slot
            # (generation guard), nor release its successor's slot.
            with pytest.raises(RuntimeError, match="reset|released"):
                t1.process(stream_data[2, 0], 2.0)
            t1.release()
            r2 = t2.process(stream_data[1, 1], 1.0)
            assert r2.success  # t2's slot survived t1's stale release
        finally:
            ex.close()
        with pytest.raises(RuntimeError, match="closed"):
            t2.process(stream_data[1, 1], 1.0)
        with pytest.raises(RuntimeError, match="closed"):
            ex.make_session_tracker()

    def test_capacity_validation(self):
        with pytest.raises(ValueError, match="capacity"):
            BatchedExecutor(BatchingConfig(intrinsics=INTR, capacity=0))

    def test_windowed_requests_coalesce_and_match(self, stream_data):
        """Sessions posting F-frame windows through process_window end at
        the same poses as per-frame aligned runs, in ONE dispatch when the
        windows co-arrive."""
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=INTR, icp=CFG, capacity=S, window=F,
            linger_ms=150.0,
        ))
        try:
            trackers = [ex.make_session_tracker() for _ in range(S)]
            barrier = threading.Barrier(S)
            results = [None] * S
            errors = []

            def worker(i):
                try:
                    barrier.wait()
                    results[i] = trackers[i].process_window(
                        stream_data[:, i], list(range(F)), window=F
                    )
                except BaseException as e:
                    errors.append(e)

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(S)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert not errors, errors
            ref = _aligned_reference(stream_data, F)
            for i in range(S):
                assert [r.frame_index for r in results[i]] == list(range(F))
                np.testing.assert_allclose(
                    results[i][-1].pose, np.asarray(ref.poses[i]), atol=1e-5
                )
                assert len(trackers[i].trajectory) == F
            st = ex.stats()
            assert st["frames"] == S * F
            # All three windows should share very few dispatches (ideally 1).
            assert st["dispatches"] <= 2
        finally:
            ex.close()

    def test_window_request_validation(self, stream_data):
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=INTR, icp=CFG, capacity=1, window=2,
        ))
        try:
            t1 = ex.make_session_tracker()
            with pytest.raises(ValueError, match="window"):
                ex.track_window(0, stream_data[:3, 0], seed=True)
            # process_window chunks to the executor window instead.
            rs = t1.process_window(stream_data[:3, 0], window=8)
            assert len(rs) == 3 and rs[0].success
        finally:
            ex.close()
        with pytest.raises(ValueError, match="window"):
            BatchedExecutor(BatchingConfig(intrinsics=INTR, window=0))

    def test_linger_early_out_when_batch_is_full(self, stream_data):
        """With every active session's frame queued, the dispatcher must
        not sleep out a huge linger window."""
        import time

        ex = BatchedExecutor(BatchingConfig(
            intrinsics=INTR, icp=CFG, capacity=2, linger_ms=30_000.0,
        ))
        try:
            trackers = [ex.make_session_tracker() for _ in range(2)]
            t0 = time.monotonic()
            threads = [
                threading.Thread(
                    target=trackers[i].process, args=(stream_data[0, i], 0.0)
                )
                for i in range(2)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=25.0)
            elapsed = time.monotonic() - t0
            assert not any(t.is_alive() for t in threads)
            assert elapsed < 25.0  # far below the 30 s linger
            assert ex.stats()["frames"] == 2
        finally:
            ex.close()

    def test_timeout_queued_is_clean_inflight_desyncs(self, stream_data,
                                                      monkeypatch):
        """A request that times out while still QUEUED is cancelled (state
        untouched, retry-safe); one that times out IN-FLIGHT poisons its
        session facade (the device slot advanced without it)."""
        import time as _time

        real = streams.step_streams_masked
        release = threading.Event()

        def slow(*a, **k):
            release.wait(20.0)
            return real(*a, **k)

        monkeypatch.setattr(streams, "step_streams_masked", slow)
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=INTR, icp=CFG, capacity=2, request_timeout_s=1.0,
        ))
        try:
            t1 = ex.make_session_tracker()
            t2 = ex.make_session_tracker()
            errs = {}

            def first():
                try:
                    t1.process(stream_data[0, 0], 0.0)
                except BaseException as e:
                    errs["t1"] = e

            th = threading.Thread(target=first)
            th.start()
            _time.sleep(0.3)  # dispatcher is now blocked inside `slow`
            # t2's frame sits in the queue behind the blocked dispatch and
            # times out QUEUED -> clean, retryable TimeoutError.
            with pytest.raises(TimeoutError, match="never dispatched"):
                t2.process(stream_data[0, 1], 0.0)
            th.join(timeout=10.0)
            assert isinstance(errs.get("t1"), SessionDesyncError)
            # t1 is poisoned until reset; t2 retries cleanly.
            with pytest.raises(SessionDesyncError, match="reset"):
                t1.process(stream_data[1, 0], 1.0)
            release.set()
            r = t2.process(stream_data[0, 1], 0.0)
            assert r.success and r.frame_index == 0
        finally:
            release.set()
            ex.close()

    def test_mesh_sharded_executor_matches_unsharded(self, stream_data):
        """Slots shard over the 8-device mesh; trajectories are unchanged
        and the device state is actually distributed."""
        import jax
        from realsensetracker_tpu.parallel import mesh as mesh_mod

        m = mesh_mod.make_mesh(8)
        with pytest.raises(ValueError, match="multiple"):
            BatchedExecutor(BatchingConfig(
                intrinsics=INTR, icp=CFG, capacity=3, mesh=m,
            ))
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=INTR, icp=CFG, capacity=8, mesh=m, window=2,
        ))
        try:
            trackers = [ex.make_session_tracker() for _ in range(S)]
            for f in range(F):
                for i in range(S):
                    trackers[i].process(stream_data[f, i], float(f))
            ref = _aligned_reference(stream_data, F)
            for i in range(S):
                np.testing.assert_allclose(
                    trackers[i].pose, np.asarray(ref.poses[i]), atol=1e-5
                )
            assert len(ex._state.poses.sharding.device_set) == 8
            # The windowed program also runs sharded: a fresh session's
            # 2-frame window on the mesh matches its per-frame twin.
            tw = ex.make_session_tracker()
            rs = tw.process_window(stream_data[:2, 0], window=2)
            assert rs[0].success and rs[1].success
            np.testing.assert_allclose(
                rs[1].pose,
                np.asarray(_aligned_reference(stream_data, 2).poses[0]),
                atol=1e-5,
            )
        finally:
            ex.close()


class TestBatchedService:
    def test_sessions_through_http_coalesce_and_match(self, stream_data):
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=INTR, icp=CFG, capacity=S, linger_ms=50.0,
        ))
        svc = TrackingService(ex.make_session_tracker, extra_status=ex.stats)
        try:
            url = f"http://127.0.0.1:{svc.port}"
            errors = []

            def worker(i):
                try:
                    for f in range(F):
                        rec = post_frame(url, stream_data[f, i],
                                         ts=float(f), session=f"s{i}")
                        assert rec["frame"] == f + 1
                except BaseException as e:
                    errors.append(e)

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(S)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert not errors
            st = get_json(url, "/status")
            assert st["frames"] == S * F
            assert st["batching"]["frames"] == S * F
            assert st["batching"]["capacity"] == S
            assert st["batching"]["active_sessions"] == S
            ref = _aligned_reference(stream_data, F)
            for i in range(S):
                assert st["sessions"][f"s{i}"]["frames"] == F
                pose = get_json(url, f"/pose?session=s{i}")["pose"]
                np.testing.assert_allclose(
                    np.asarray(pose), np.asarray(ref.poses[i]), atol=1e-5
                )
                tum = get_json(url, f"/trajectory?session=s{i}")
                assert len(tum.strip().splitlines()) == F
            text = get_json(url, "/metrics")
            assert f"rst_batch_frames_total {S * F}" in text
            assert "rst_batch_dispatches_total" in text
            assert "rst_batch_mean_size" in text
        finally:
            svc.close()
            ex.close()

    def test_track_window_through_http_batched(self, stream_data):
        """POST /track_window against a --batched-style service uses the
        executor's windowed program and matches the aligned reference."""
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=INTR, icp=CFG, capacity=S, window=F,
        ))
        svc = TrackingService(ex.make_session_tracker, extra_status=ex.stats)
        try:
            url = f"http://127.0.0.1:{svc.port}"
            out = post_window(url, stream_data[:, 0],
                              ts=np.arange(F, dtype=np.float64),
                              session="w0", window=F)
            assert out["windowed"] is True
            assert len(out["frames"]) == F
            assert [r["frame"] for r in out["frames"]] == list(range(1, F + 1))
            ref = _aligned_reference(stream_data, F)
            np.testing.assert_allclose(
                np.asarray(out["frames"][-1]["pose"]),
                np.asarray(ref.poses[0]), atol=1e-5,
            )
            st = get_json(url, "/status")
            assert st["batching"]["frames"] == F
            assert st["batching"]["dispatches"] == 1  # one window dispatch
            # mean_batch counts SESSIONS per round, not frames: one session
            # posting a window must not read as F co-batched sessions.
            assert st["batching"]["mean_batch"] == 1.0
        finally:
            svc.close()
            ex.close()

    def test_track_window_honest_windowed_flag(self, stream_data):
        """A batched service whose executor window is 1 dispatches
        /track_window frames one by one -- the response must say so."""
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=INTR, icp=CFG, capacity=1,
        ))
        svc = TrackingService(ex.make_session_tracker, extra_status=ex.stats)
        try:
            url = f"http://127.0.0.1:{svc.port}"
            out = post_window(url, stream_data[:2, 0], window=4)
            assert out["windowed"] is False
            assert len(out["frames"]) == 2
            assert all(r["success"] for r in out["frames"])
        finally:
            svc.close()
            ex.close()

    def test_capacity_exhaustion_is_500(self, stream_data):
        """S sessions hold every slot; an (S+1)-th session's first frame
        fails with a capacity error, not a hang or crash."""
        import urllib.error

        ex = BatchedExecutor(BatchingConfig(
            intrinsics=INTR, icp=CFG, capacity=1,
        ))
        svc = TrackingService(ex.make_session_tracker, extra_status=ex.stats)
        try:
            url = f"http://127.0.0.1:{svc.port}"
            post_frame(url, stream_data[0, 0], session="a")
            with pytest.raises(urllib.error.HTTPError) as ei:
                post_frame(url, stream_data[0, 1], session="b")
            assert ei.value.code == 500
            assert "capacity" in ei.value.read().decode()
            # /reset releases session a's slot; a new session can join.
            import urllib.request

            with urllib.request.urlopen(urllib.request.Request(
                url + "/reset?session=a", data=b""
            ), timeout=30) as r:
                assert r.status == 200
            rec = post_frame(url, stream_data[0, 1], session="b")
            assert rec["frame"] == 1
        finally:
            svc.close()
            ex.close()


RGBD_INTR = camera.Intrinsics(fx=64.0, fy=64.0, cx=31.5, cy=23.5,
                              width=64, height=48)
RGBD_CFG = rgbd_align.RgbdIcpConfig(iters=(4, 4), samples=512,
                                    min_samples=128)
S2 = 2


@pytest.fixture(scope="module")
def rgbd_stream_data():
    """(F, S2, H, W) depths + grays: textured scenes per session."""
    from realsensetracker_tpu.data import synthetic as syn

    depths, grays = [], []
    for i in range(S2):
        d, c, _ = syn.render_trajectory_rgbd(
            RGBD_INTR, F, scene=syn.default_scene(seed=70 + i), seed=i,
            step_scale=0.01,
        )
        depths.append(np.asarray(d, np.float32))
        grays.append(np.asarray(syn.intensity_from_rgb(c), np.float32))
    return np.stack(depths, 1), np.stack(grays, 1)


class TestRgbdBatched:
    def _reference_poses(self, depths, grays, frames):
        """Per-slot sequential register_rgbd_pair chain (the masked step's
        semantics: success replaces the reference, failure holds)."""
        rgbd_mod = rgbd_align
        from realsensetracker_tpu.geometry import se3

        poses = []
        for i in range(S2):
            pose = np.eye(4, dtype=np.float32)
            ref = 0
            for f in range(1, frames):
                res = rgbd_mod.register_rgbd_pair(
                    depths[f, i], grays[f, i], depths[ref, i], grays[ref, i],
                    RGBD_INTR, RGBD_CFG,
                )
                T = np.asarray(res.transform)
                ok = (np.isfinite(T).all()
                      and float(res.inlier_fraction) >= 0.2)
                if ok:
                    pose = np.asarray(se3.orthonormalize(
                        se3.compose(jnp.asarray(pose), jnp.asarray(T))
                    ), np.float32)
                    ref = f
            poses.append(pose)
        return np.stack(poses)

    def test_masked_rgbd_matches_pairwise_chain(self, rgbd_stream_data):
        depths, grays = rgbd_stream_data
        state = streams.blank_streams_rgbd(RGBD_INTR, RGBD_CFG,
                                           num_streams=S2)
        active = jnp.ones((S2,), bool)
        for f in range(F):
            seed = jnp.full((S2,), f == 0)
            state, stats = streams.step_streams_masked_rgbd(
                state, jnp.asarray(depths[f]), jnp.asarray(grays[f]),
                active, seed, RGBD_INTR, RGBD_CFG,
            )
        stats = np.asarray(stats)
        assert stats.shape == (S2, streams.MASKED_RGBD_STATS_WIDTH)
        assert (stats[:, 32] > 0.5).all()  # tracking succeeded
        ref_poses = self._reference_poses(depths, grays, F)
        np.testing.assert_allclose(
            np.asarray(state.poses), ref_poses, atol=1e-5
        )
        # the photometric term actually ran: finite photo rmse reported
        assert np.isfinite(stats[:, 34]).all()

    def test_rgbd_window_scan_matches_steps(self, rgbd_stream_data):
        depths, grays = rgbd_stream_data
        W = F
        sa = streams.blank_streams_rgbd(RGBD_INTR, RGBD_CFG, num_streams=S2)
        sb = streams.blank_streams_rgbd(RGBD_INTR, RGBD_CFG, num_streams=S2)
        d = jnp.asarray(np.moveaxis(depths[:W], 0, 1))  # (S2, W, H, Wd)
        g = jnp.asarray(np.moveaxis(grays[:W], 0, 1))
        active = jnp.ones((S2, W), bool)
        seed = jnp.zeros((S2, W), bool).at[:, 0].set(True)
        sa, stats_a = streams.step_streams_masked_rgbd_window(
            sa, d, g, active, seed, RGBD_INTR, RGBD_CFG,
        )
        per = []
        for j in range(W):
            sb, st = streams.step_streams_masked_rgbd(
                sb, d[:, j], g[:, j], active[:, j], seed[:, j],
                RGBD_INTR, RGBD_CFG,
            )
            per.append(np.asarray(st))
        np.testing.assert_allclose(
            np.asarray(stats_a), np.stack(per, 1), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sa.poses), np.asarray(sb.poses), atol=1e-6
        )

    def test_rgbd_executor_through_http(self, rgbd_stream_data):
        depths, grays = rgbd_stream_data
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=RGBD_INTR, rgbd=True, rgbd_icp=RGBD_CFG,
            capacity=S2, window=2,
        ))
        svc = TrackingService(ex.make_session_tracker, extra_status=ex.stats)
        try:
            url = f"http://127.0.0.1:{svc.port}"
            import urllib.error

            # missing color on an rgbd service is a clean 500, not a hang
            with pytest.raises(urllib.error.HTTPError) as ei:
                post_frame(url, depths[0, 0], session="s0")
            assert "intensity" in ei.value.read().decode()
            for f in range(F):
                rec = post_frame(url, depths[f, 0], ts=float(f),
                                 color=grays[f, 0], session="s0")
                assert rec["success"]
            # windowed rgbd: session s1 posts all frames as one batch
            out = post_window(url, depths[:, 1], grays=grays[:, 1],
                              ts=np.arange(F, dtype=np.float64),
                              session="s1", window=2)
            assert len(out["frames"]) == F
            assert all(r["success"] for r in out["frames"])
            ref_poses = self._reference_poses(depths, grays, F)
            pose0 = get_json(url, "/pose?session=s0")["pose"]
            np.testing.assert_allclose(np.asarray(pose0), ref_poses[0],
                                       atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(out["frames"][-1]["pose"]), ref_poses[1],
                atol=1e-5,
            )
        finally:
            svc.close()
            ex.close()


class TestServeCliBatched:
    def test_batched_flag_end_to_end(self, capsys):
        import re
        import time

        from realsensetracker_tpu.cli import rs_serve

        w, h = 64, 48
        intr = camera.Intrinsics(fx=64.0, fy=64.0, cx=(w - 1) / 2,
                                 cy=(h - 1) / 2, width=w, height=h)
        depths, _ = synthetic.render_trajectory(intr, 2, seed=0,
                                                step_scale=0.01)
        rc_holder = {}

        def run():
            rc_holder["rc"] = rs_serve.main([
                "--batched", "--batch-capacity", "2",
                "--width", str(w), "--height", str(h), "--fx", "64",
                "--max-frames", "2",
            ])

        t = threading.Thread(target=run)
        t.start()
        port = None
        for _ in range(100):
            out = capsys.readouterr().out
            m = re.search(r"http://127\.0\.0\.1:(\d+)/", out)
            if m:
                port = int(m.group(1))
                break
            time.sleep(0.1)
        assert port, "service did not start"
        assert "batched" in out
        url = f"http://127.0.0.1:{port}"
        r1 = post_frame(url, np.asarray(depths[0]), ts=0.0)
        r2 = post_frame(url, np.asarray(depths[1]), ts=1 / 30.0)
        assert r1["success"] and r2["success"]
        t.join(timeout=120)
        assert not t.is_alive() and rc_holder["rc"] == 0
        assert "served 2 frames" in capsys.readouterr().out


# --- dense (TSDF) slots ------------------------------------------------------

TSDF_INTR = camera.Intrinsics(fx=64.0, fy=64.0, cx=39.5, cy=29.5,
                              width=80, height=60)
TSDF_ICP = projective.ProjectiveIcpConfig(
    iters=(3, 3), inner_iters=2, samples=768, min_samples=192
)
S3 = 2


@pytest.fixture(scope="module")
def tsdf_stream_data():
    all_depths = []
    for i in range(S3):
        scene = synthetic.default_scene(seed=30 + i)
        d, _ = synthetic.render_trajectory(TSDF_INTR, F, scene=scene,
                                           seed=i, step_scale=0.01)
        all_depths.append(np.asarray(d, np.float32))
    return np.stack(all_depths, 1)  # (F, S3, H, W)


def _tsdf_cfg():
    from realsensetracker_tpu.mapping.tsdf import TsdfConfig

    return TsdfConfig(resolution=48, voxel_size=0.12,
                      origin=(-2.88, -2.16, -0.4), trunc=0.36,
                      max_range=5.0)


class TestTsdfSlots:
    def test_masked_matches_single_tracker(self, tsdf_stream_data):
        from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

        cfg = _tsdf_cfg()
        state = streams.blank_tsdf_streams(TSDF_INTR, cfg, num_streams=S3)
        active = jnp.ones((S3,), bool)
        for f in range(F):
            seed = jnp.full((S3,), f == 0)
            state, stats = streams.step_tsdf_streams_masked(
                state, jnp.asarray(tsdf_stream_data[f]), active, seed,
                TSDF_INTR, cfg, TSDF_ICP,
            )
        stats = np.asarray(stats)
        assert stats.shape == (S3, streams.MASKED_STATS_WIDTH)
        assert (stats[:, 32] > 0.5).all()
        for i in range(S3):
            tr = TsdfTracker(TSDF_INTR, volume=cfg, icp=TSDF_ICP)
            for f in range(F):
                tr.process(tsdf_stream_data[f, i], float(f))
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

    def test_inactive_slots_bit_identical_and_reseed(self, tsdf_stream_data):
        cfg = _tsdf_cfg()
        state = streams.blank_tsdf_streams(TSDF_INTR, cfg, num_streams=S3)
        both = jnp.ones((S3,), bool)
        state, _ = streams.step_tsdf_streams_masked(
            state, jnp.asarray(tsdf_stream_data[0]), both, both,
            TSDF_INTR, cfg, TSDF_ICP,
        )
        # Advance ONLY slot 0; slot 1 must hold bit-identically.
        only0 = jnp.asarray([True, False])
        before_vol1 = np.asarray(state.volume.tsdf[1])
        before_pose1 = np.asarray(state.poses[1])
        state, stats = streams.step_tsdf_streams_masked(
            state, jnp.asarray(tsdf_stream_data[1]), only0,
            jnp.zeros((S3,), bool), TSDF_INTR, cfg, TSDF_ICP,
        )
        np.testing.assert_array_equal(
            np.asarray(state.volume.tsdf[1]), before_vol1
        )
        np.testing.assert_array_equal(np.asarray(state.poses[1]),
                                      before_pose1)
        assert np.asarray(stats)[1, 32] < 0.5  # inactive row reports fail
        # Re-seeding slot 0 resets its pose to identity and its volume to
        # a fresh single-frame fusion.
        state, stats = streams.step_tsdf_streams_masked(
            state, jnp.asarray(tsdf_stream_data[2]), only0, only0,
            TSDF_INTR, cfg, TSDF_ICP,
        )
        np.testing.assert_allclose(np.asarray(state.poses[0]), np.eye(4),
                                   atol=1e-6)
        from realsensetracker_tpu.geometry import se3
        from realsensetracker_tpu.mapping import tsdf as tsdf_mod

        fresh = tsdf_mod.integrate(
            tsdf_mod.init_volume(cfg), jnp.asarray(tsdf_stream_data[2, 0]),
            se3.identity(), TSDF_INTR, cfg,
        )
        np.testing.assert_allclose(
            np.asarray(state.volume.tsdf[0]), np.asarray(fresh.tsdf),
            atol=1e-6,
        )

    def test_window_scan_matches_steps(self, tsdf_stream_data):
        cfg = _tsdf_cfg()
        W = F
        sa = streams.blank_tsdf_streams(TSDF_INTR, cfg, num_streams=S3)
        sb = streams.blank_tsdf_streams(TSDF_INTR, cfg, num_streams=S3)
        d = jnp.asarray(np.moveaxis(tsdf_stream_data[:W], 0, 1))
        active = jnp.ones((S3, W), bool)
        seed = jnp.zeros((S3, W), bool).at[:, 0].set(True)
        sa, stats_a = streams.step_tsdf_streams_masked_window(
            sa, d, active, seed, TSDF_INTR, cfg, TSDF_ICP,
        )
        per = []
        for j in range(W):
            sb, st = streams.step_tsdf_streams_masked(
                sb, d[:, j], active[:, j], seed[:, j], TSDF_INTR, cfg,
                TSDF_ICP,
            )
            per.append(np.asarray(st))
        np.testing.assert_allclose(np.asarray(stats_a), np.stack(per, 1),
                                   atol=1e-6)
        # Volumes: the scanned and per-step programs fuse differently, so
        # a ~1e-7 pose difference can flip a nearest-pixel gather index on
        # voxels that project exactly onto a pixel boundary (measured 18
        # of 221k voxels). Everything else must agree to float precision.
        va, vb = np.asarray(sa.volume.tsdf), np.asarray(sb.volume.tsdf)
        flipped = np.abs(va - vb) > 1e-5
        assert flipped.mean() < 1e-3, f"{flipped.sum()} voxels differ"
        np.testing.assert_allclose(va[~flipped], vb[~flipped], atol=1e-5)

    def test_tsdf_executor_through_http(self, tsdf_stream_data):
        from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

        cfg = _tsdf_cfg()
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=TSDF_INTR, icp=TSDF_ICP, capacity=S3,
            tsdf=True, tsdf_cfg=cfg, window=2,
        ))
        svc = TrackingService(ex.make_session_tracker)
        try:
            url = f"http://127.0.0.1:{svc.port}"
            sessions = [f"s{i}" for i in range(S3)]
            recs = {sid: [] for sid in sessions}
            # Interleave: per-frame posts for s0, windowed for s1.
            for f in range(F):
                recs["s0"].append(post_frame(
                    url, tsdf_stream_data[f, 0], ts=f / 30.0, session="s0"
                ))
            out = post_window(
                url, np.asarray(tsdf_stream_data[:, 1]),
                ts=np.arange(F) / 30.0, window=2, session="s1",
            )
            recs["s1"] = out["frames"]
            for i, sid in enumerate(sessions):
                tr = TsdfTracker(TSDF_INTR, volume=cfg, icp=TSDF_ICP)
                for f in range(F):
                    tr.process(tsdf_stream_data[f, i], float(f))
                np.testing.assert_allclose(
                    np.asarray(recs[sid][-1]["pose"]).reshape(4, 4),
                    np.asarray(tr.pose), atol=1e-4,
                )
            assert ex.stats()["frames"] == 2 * F
        finally:
            svc.close()
            ex.close()

    def test_mesh_sharded_tsdf_executor_matches_tracker(
            self, tsdf_stream_data):
        """Dense slots shard over the mesh data axis (each device holds
        capacity/n_data whole volumes); trajectories are unchanged."""
        from realsensetracker_tpu.parallel import mesh as mesh_mod
        from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

        cfg = _tsdf_cfg()
        m = mesh_mod.make_mesh(4)
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=TSDF_INTR, icp=TSDF_ICP, capacity=4,
            tsdf=True, tsdf_cfg=cfg, mesh=m,
        ))
        try:
            trackers = [ex.make_session_tracker() for _ in range(S3)]
            for f in range(F):
                for i in range(S3):
                    trackers[i].process(tsdf_stream_data[f, i], float(f))
            for i in range(S3):
                tr = TsdfTracker(TSDF_INTR, volume=cfg, icp=TSDF_ICP)
                for f in range(F):
                    tr.process(tsdf_stream_data[f, i], float(f))
                np.testing.assert_allclose(
                    trackers[i].pose, np.asarray(tr.pose), atol=1e-4
                )
            assert len(ex._state.volume.tsdf.sharding.device_set) == 4
        finally:
            ex.close()

    def test_submap_radius_gives_unbounded_extent(self):
        """A session walking out of its volume stays tracked under
        tsdf_submap_radius (anchor-composed reseeds), where the fixed
        single-volume executor degrades; the reseed counter advances and
        the windowed path handles mid-chunk drift (anchor updates at the
        reseed, not at detection)."""
        from realsensetracker_tpu.mapping.tsdf import TsdfConfig

        vol = TsdfConfig(resolution=48, voxel_size=0.05,
                         origin=(-1.2, -1.2, -0.2625), trunc=0.15,
                         max_range=3.0, max_depth=4.0)
        rng = np.random.RandomState(3)
        ns = 12
        cx = np.linspace(-0.5, 3.0, ns)
        centers = np.stack(
            [cx, rng.uniform(-0.3, 0.55, ns), rng.uniform(0.9, 1.6, ns)], 1
        ).astype(np.float32)
        scene = synthetic.Scene(
            sphere_centers=jnp.asarray(centers),
            sphere_radii=jnp.asarray(
                rng.uniform(0.16, 0.32, ns).astype(np.float32)),
            floor_y=0.9, wall_z=2.2,
        )
        nf = 40
        gt = np.tile(np.eye(4, dtype=np.float32), (nf, 1, 1))
        gt[:, 0, 3] = np.linspace(0.0, 2.0, nf)
        depths, _ = synthetic.render_trajectory(TSDF_INTR, nf, scene=scene,
                                                poses=jnp.asarray(gt))
        depths = np.asarray(depths, np.float32)

        def run(radius, window):
            ex = BatchedExecutor(BatchingConfig(
                intrinsics=TSDF_INTR, icp=TSDF_ICP, capacity=2,
                tsdf=True, tsdf_cfg=vol, tsdf_submap_radius=radius,
                window=window,
            ))
            try:
                tr = ex.make_session_tracker()
                if window > 1:
                    rs = tr.process_window(depths, window=window)
                else:
                    rs = [tr.process(depths[f], float(f))
                          for f in range(nf)]
                est = np.stack(list(tr.trajectory.poses))
                err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
                return rs, err, tr
            finally:
                ex.close()

        rs_fix, err_fix, _ = run(0.0, 1)
        rs_sub, err_sub, tr_sub = run(0.6, 1)
        assert all(r.success for r in rs_sub)
        assert tr_sub.num_reseeds >= 2
        assert err_sub.max() < 0.25
        fixed_ok = sum(r.success for r in rs_fix)
        assert fixed_ok < nf or err_fix.max() > 3 * err_sub.max()
        # Windowed path: same unbounded behavior through scanned chunks.
        rs_win, err_win, tr_win = run(0.6, 4)
        assert all(r.success for r in rs_win)
        assert tr_win.num_reseeds >= 2
        assert err_win.max() < 0.3

    def test_submap_radius_requires_tsdf(self):
        with pytest.raises(ValueError, match="tsdf"):
            BatchedExecutor(BatchingConfig(
                intrinsics=TSDF_INTR, tsdf_submap_radius=0.5,
            ))

    def test_rgbd_tsdf_exclusive(self):
        with pytest.raises(ValueError, match="exclusive"):
            BatchedExecutor(BatchingConfig(
                intrinsics=TSDF_INTR, rgbd=True, tsdf=True,
            ))


class TestU16Batched:
    """Raw uint16 frames through the executor: all-integer rounds stage
    uint16 (half the upload; on-device convert via
    BatchingConfig.depth_scale), mixed rounds host-convert the integer
    requests -- either way every session's trajectory is identical to
    the f32 path on identically-quantized frames."""

    def test_u16_sessions_match_f32(self, stream_data):
        scale = 1.0 / 5000.0
        raw = np.asarray(stream_data * 5000.0 + 0.5, np.uint16)
        quant = raw.astype(np.float32) * np.float32(scale)
        outs = []
        for data, ds in ((quant, None), (raw, scale)):
            kw = {} if ds is None else {"depth_scale": ds}
            ex = BatchedExecutor(BatchingConfig(
                intrinsics=INTR, icp=CFG, capacity=S, **kw))
            try:
                trackers = [ex.make_session_tracker() for _ in range(S)]
                res = [
                    [trackers[i].process(data[f, i], float(f))
                     for f in range(F)]
                    for i in range(S)
                ]
                outs.append(res)
            finally:
                ex.close()
        for i in range(S):
            for f in range(F):
                a, b = outs[0][i][f], outs[1][i][f]
                assert a.success == b.success
                np.testing.assert_allclose(a.pose, b.pose, atol=1e-5)

    def test_mixed_window_list_converts_to_meters(self, stream_data):
        """One process_window call mixing raw u16 and f32-meters frames:
        np.asarray over the mixed list would promote the raw frames to
        float COUNTS read as meters (5000x off) -- the session tracker
        must convert the integer frames at the executor's scale instead,
        matching the all-quantized-meters run."""
        scale = 1.0 / 5000.0
        raw = np.asarray(stream_data * 5000.0 + 0.5, np.uint16)
        quant = raw.astype(np.float32) * np.float32(scale)
        outs = []
        for mixed in (False, True):
            ex = BatchedExecutor(BatchingConfig(
                intrinsics=INTR, icp=CFG, capacity=1, window=4,
                depth_scale=scale))
            try:
                tr = ex.make_session_tracker()
                frames = [quant[f, 0] for f in range(4)]
                if mixed:
                    frames[1] = raw[1, 0]
                    frames[2] = raw[2, 0]
                outs.append(tr.process_window(frames, window=4))
            finally:
                ex.close()
        for a, b in zip(outs[0], outs[1]):
            assert a.success == b.success
            np.testing.assert_allclose(a.pose, b.pose, atol=1e-5)

    def test_mixed_round_host_converts(self, stream_data):
        # One session posts raw u16, another f32 meters, in the SAME
        # linger-coalesced round: the executor stages f32 and converts
        # the integer request on host; both match their pure-f32 runs.
        scale = 1.0 / 5000.0
        raw = np.asarray(stream_data * 5000.0 + 0.5, np.uint16)
        quant = raw.astype(np.float32) * np.float32(scale)
        ex = BatchedExecutor(BatchingConfig(
            intrinsics=INTR, icp=CFG, capacity=2, linger_ms=150.0,
            depth_scale=scale))
        try:
            trackers = [ex.make_session_tracker() for _ in range(2)]
            barrier = threading.Barrier(2)
            results = [[] for _ in range(2)]
            errors = []

            def worker(i):
                try:
                    for f in range(F):
                        barrier.wait()
                        frame = raw[f, i] if i == 0 else quant[f, i]
                        results[i].append(
                            trackers[i].process(frame, float(f)))
                except BaseException as e:  # pragma: no cover
                    errors.append(e)

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert not errors
            ref = _aligned_reference(stream_data[:, :2], F)
            for i in range(2):
                assert all(r.success for r in results[i])
                np.testing.assert_allclose(
                    results[i][-1].pose, np.asarray(ref.poses[i]),
                    atol=2e-4,  # u16 quantization vs the unquantized ref
                )
        finally:
            ex.close()
