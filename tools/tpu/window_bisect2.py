"""Layer-2 window bisect: the raw _fused_track_window program is 3.2x
FASTER per frame than the per-frame step (window_bisect.py, 2026-08-19:
8.5 vs 27.3 ms/frame in-process), yet rs_replay --window 4 measured
150.4 ms/frame vs 42.1 per-frame and rs_streams --window 4 measured 11
vs 188 FPS/stream. So the regression lives in the HOST layers. Time
each layer on the same synth640 data, one process:

  kf_pf      KeyframeTracker.process per frame (class, host logic)
  kf_win     KeyframeTracker.process_window W=4 pad_to=4
  slam_pf    SLAM tracker per-frame
  slam_win   SLAM tracker process_window W=4
  str_pf     step_streams_masked per step, FENCED per call (true latency;
             the rs_streams CLI fences only at the end, so its per-frame
             FPS is pipelined throughput, not latency)
  str_win    step_streams_masked_window W=4, fenced per window

Run from /root/repo:  python - < tools/tpu/window_bisect2.py
"""
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from realsensetracker_tpu.data import tum
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.parallel import streams
from realsensetracker_tpu.tracking.keyframe import KeyframeTracker
from realsensetracker_tpu.tracking.slam import SlamTracker

print("devices:", jax.devices(), flush=True)
seq = tum.TumSequence.open("/root/repo/.data/synth640")
F = 61
frames = [np.asarray(seq.depth(i), np.float32) for i in range(F)]
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
res = {}


def record(key, value):
    res[key] = value
    print(f"partial {key}: {value}", flush=True)


# --- KeyframeTracker: per-frame vs windowed ---------------------------------
tr = KeyframeTracker(intr=intr)
tr.process(frames[0], 0.0)
tr.process(frames[1], 1.0)  # compile steady program outside timing
ts = []
events = 0
for f in range(2, F):
    t0 = time.perf_counter()
    r = tr.process(frames[f], float(f))
    ts.append((time.perf_counter() - t0) * 1e3)
    events += int(r.is_new_keyframe)
record("kf_pf_ms", statistics.median(ts))
record("kf_pf_events", events)

W = 4
tr2 = KeyframeTracker(intr=intr)
tr2.process(frames[0], 0.0)
tr2.process_window(frames[1:1 + W], [float(i) for i in range(1, 1 + W)],
                   pad_to=W)  # window-program compile
ts, i, dispatches, events = [], 1 + W, 0, 0
while i + 1 <= F - 1:
    chunk = frames[i:i + W]
    t0 = time.perf_counter()
    out = tr2.process_window(chunk, [float(i + k) for k in range(len(chunk))],
                             pad_to=W)
    ts.append(((time.perf_counter() - t0) * 1e3, len(out)))
    dispatches += 1
    events += int(out[-1].is_new_keyframe)
    i += len(out)
per_frame = [t / n for t, n in ts]
record("kf_win4_ms_per_frame", statistics.median(per_frame))
record("kf_win4_dispatches", dispatches)
record("kf_win4_frames", i - (1 + W))
record("kf_win4_events", events)
record("kf_win4_ms_per_dispatch",
       statistics.median([t for t, _ in ts]))

# --- SLAM: per-frame vs windowed ---------------------------------------------
from realsensetracker_tpu.tracking.slam import SlamConfig

slam = SlamTracker(SlamConfig(intrinsics=intr))
slam.process(frames[0], 0.0)
slam.process(frames[1], 1.0)
ts = []
for f in range(2, F):
    t0 = time.perf_counter()
    slam.process(frames[f], float(f))
    ts.append((time.perf_counter() - t0) * 1e3)
record("slam_pf_ms", statistics.median(ts))
record("slam_pf_p90", sorted(ts)[int(0.9 * len(ts))])

slam2 = SlamTracker(SlamConfig(intrinsics=intr))
slam2.process(frames[0], 0.0)
slam2.process_window(frames[1:1 + W], [float(i) for i in range(1, 1 + W)],
                     window=W)
ts, i = [], 1 + W
while i + W <= F:
    t0 = time.perf_counter()
    out = slam2.process_window(frames[i:i + W],
                               [float(i + k) for k in range(W)], window=W)
    ts.append((time.perf_counter() - t0) * 1e3 / len(out))
    i += len(out)
record("slam_win4_ms_per_frame", statistics.median(ts))
record("slam_win4_p90", sorted(ts)[int(0.9 * len(ts))])

# --- masked streams: fenced per-step vs windowed -----------------------------
S = 8
sframes = np.stack([frames[:33]] * S)  # (S, F, H, W) same seq per slot
# jitter per slot so dispatches are unique (gotcha 2)
rng = np.random.RandomState(0)
sframes = sframes + rng.uniform(0, 1e-4, (S, 1, 1, 1)).astype(np.float32)
on = jnp.ones((S,), bool)
off = jnp.zeros((S,), bool)
st = streams.blank_streams(intr, num_streams=S)
st, _ = streams.step_streams_masked(st, jnp.asarray(sframes[:, 0]), on, on,
                                    intr)
st, _ = streams.step_streams_masked(st, jnp.asarray(sframes[:, 1]), on, off,
                                    intr)
np.asarray(st.poses)
ts = []
for f in range(2, 26):
    t0 = time.perf_counter()
    st, stats = streams.step_streams_masked(
        st, jnp.asarray(sframes[:, f]), on, off, intr)
    np.asarray(stats)  # fence
    ts.append((time.perf_counter() - t0) * 1e3)
record("str_pf_fenced_ms", statistics.median(ts))

st2 = streams.blank_streams(intr, num_streams=S)
st2, _ = streams.step_streams_masked(st2, jnp.asarray(sframes[:, 0]), on, on,
                                     intr)
act = jnp.ones((S, W), bool)
sd = jnp.zeros((S, W), bool)
win0 = jnp.asarray(sframes[:, 1:1 + W])
st2, _ = streams.step_streams_masked_window(st2, win0, act, sd, intr)
np.asarray(st2.poses)
ts = []
for k in range(1 + W, 25 - W, W):
    win = jnp.asarray(sframes[:, k:k + W])
    t0 = time.perf_counter()
    st2, stats = streams.step_streams_masked_window(st2, win, act, sd, intr)
    np.asarray(stats)
    ts.append((time.perf_counter() - t0) * 1e3 / W)
record("str_win4_ms_per_frame", statistics.median(ts))

print("WINDOW_BISECT2", json.dumps(res), flush=True)
