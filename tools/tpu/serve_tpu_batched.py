"""On-TPU cross-session serving measurement (CLAUDE.md pending item):
8 sessions x 16 frames at 640x480 -- serialized (one api.Tracker per
session, round-robin) vs batched (BatchedExecutor, 8 threads coalescing
into one dispatch per round) vs batched+window (4-frame /track_window
chunks). One process; distinct per-session/per-round inputs + host
materialization defeat the relay memoizer (gotcha 2/11).

Run from /root/repo:  python - < tools/tpu/serve_tpu_batched.py
"""
import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

from realsensetracker_tpu.api.batching import BatchedExecutor, BatchingConfig
from realsensetracker_tpu.api.config import TrackerConfig
from realsensetracker_tpu.api.tracker import Tracker
from realsensetracker_tpu.data import tum
from realsensetracker_tpu.geometry import camera

print("devices:", jax.devices(), flush=True)
S, F = 8, 16
seq = tum.TumSequence.open("/root/repo/.data/synth640")
base = np.stack([np.asarray(seq.depth(i), np.float32) for i in range(F)])
rng = np.random.RandomState(0)
# per-session distinct streams: tiny depth jitter (sub-mm, keeps tracking
# identical in character but every device input unique)
frames = [base + np.float32(2e-4) * rng.randn(F, 1, 1).astype(np.float32)
          for _ in range(S)]
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
out = {}

# --- serialized: one Tracker per session, round-robin ----------------------
trackers = [Tracker(TrackerConfig(intrinsics=intr, method="keyframe"))
            for _ in range(S)]
# Warm through frame 1: frame 0 takes the SEED branch only; the shared
# _fused_track_step program first compiles at frame 1 (30-90 s via the
# relay, gotcha 8) and must not land inside the timed loop -- the batched
# section warms its steady program too, so both time f=2..F.
for s in range(S):
    trackers[s].process(frames[s][0], 0.0)
    trackers[s].process(frames[s][1], 1.0)
t0 = time.perf_counter()
for f in range(2, F):
    for s in range(S):
        trackers[s].process(frames[s][f], float(f))
serialized = (time.perf_counter() - t0) * 1e3 / (F - 2)
out["serialized_ms_per_round"] = serialized
print("serialized ms/round-of-8:", serialized, flush=True)

# --- batched: executor, concurrent single-frame posts ----------------------
ex = BatchedExecutor(BatchingConfig(intrinsics=intr, capacity=S, window=4))
sess = [ex.make_session_tracker() for _ in range(S)]


def post_all(f):
    ths = []
    for s in range(S):
        th = threading.Thread(
            target=lambda s=s: sess[s].process(frames[s][f], float(f)))
        th.start()
        ths.append(th)
    for th in ths:
        th.join()


post_all(0)  # seed + compile
post_all(1)  # warm steady program
t0 = time.perf_counter()
for f in range(2, F):
    post_all(f)
batched = (time.perf_counter() - t0) * 1e3 / (F - 2)
out["batched_ms_per_round"] = batched
print("batched ms/round-of-8:", batched, flush=True)

# --- batched + window: 4-frame chunks per request --------------------------
ex2 = BatchedExecutor(BatchingConfig(intrinsics=intr, capacity=S, window=4))
sess2 = [ex2.make_session_tracker() for _ in range(S)]


def post_windows(f0, n):
    ths = []
    for s in range(S):
        th = threading.Thread(target=lambda s=s: sess2[s].process_window(
            [frames[s][f] for f in range(f0, f0 + n)],
            [float(f) for f in range(f0, f0 + n)], window=4))
        th.start()
        ths.append(th)
    for th in ths:
        th.join()


for s in range(S):
    sess2[s].process(frames[s][0], 0.0)  # seed
post_windows(1, 4)  # compile window program
t0 = time.perf_counter()
post_windows(5, 4)
post_windows(9, 4)
wind = (time.perf_counter() - t0) * 1e3 / 8  # 8 frames x 8 sessions
out["batched_window_ms_per_round"] = wind
print("batched+window ms/round-of-8:", wind, flush=True)
st = ex.stats() if hasattr(ex, "stats") else {}
out["executor_stats"] = st
print("SERVE_TPU_BATCHED", json.dumps(out), flush=True)
ex.close() if hasattr(ex, "close") else None
ex2.close() if hasattr(ex2, "close") else None
