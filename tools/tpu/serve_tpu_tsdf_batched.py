"""On-TPU dense (TSDF-slot) serving measurement (CLAUDE.md pending item
11): 8 KinectFusion sessions at 640x480, 96^3 x 4 cm volume per slot --
serialized (one TsdfTracker per session, round-robin) vs batched
(BatchedExecutor tsdf=True coalescing 8 sessions into one vmapped
raycast/register/integrate dispatch per round).

HBM: 8 slots x 2 x 96^3 x 4 B = 57 MB (plus the serialized trackers'
volumes) -- comfortably within one chip.

Memoization-proof per gotcha 2: per-session distinct streams (depth
jitter) and distinct frames per round; every step materializes stats.

Run from /root/repo:  python - < tools/tpu/serve_tpu_tsdf_batched.py
"""
import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

from realsensetracker_tpu.api.batching import BatchedExecutor, BatchingConfig
from realsensetracker_tpu.data import tum
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.mapping import tsdf
from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

print("devices:", jax.devices(), flush=True)
S, F = 8, 12
seq = tum.TumSequence.open("/root/repo/.data/synth640")
base = np.stack([np.asarray(seq.depth(i), np.float32) for i in range(F)])
rng = np.random.RandomState(0)
frames = [base + np.float32(2e-4) * rng.randn(F, 1, 1).astype(np.float32)
          for _ in range(S)]
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
vol_cfg = tsdf.sized_config(resolution=96, voxel_size=0.04)
out = {}

# --- serialized: one TsdfTracker per session, round-robin -------------------
trackers = [TsdfTracker(intr=intr, volume=vol_cfg) for _ in range(S)]
# Warm through frame 1: frame 0 seeds the volume only; the fused
# raycast/register/integrate program compiles at frame 1 (gotcha 8).
for s in range(S):
    trackers[s].process(frames[s][0], 0.0)
    trackers[s].process(frames[s][1], 1.0)
t0 = time.perf_counter()
for f in range(2, F):
    for s in range(S):
        trackers[s].process(frames[s][f], float(f))
serialized = (time.perf_counter() - t0) * 1e3 / (F - 2)
out["serialized_ms_per_round"] = serialized
print("partial serialized ms/round-of-8:", serialized, flush=True)
del trackers  # free the 8 per-session volumes before the batched section

# --- batched: executor with TSDF slots, concurrent single-frame posts -------
ex = BatchedExecutor(BatchingConfig(intrinsics=intr, capacity=S,
                                    tsdf=True, tsdf_cfg=vol_cfg))
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


post_all(0)  # seed slots + compile the masked dense step
post_all(1)  # warm steady rounds
t0 = time.perf_counter()
for f in range(2, F):
    post_all(f)
batched = (time.perf_counter() - t0) * 1e3 / (F - 2)
out["batched_ms_per_round"] = batched
out["speedup"] = serialized / batched
out["executor_stats"] = ex.stats() if hasattr(ex, "stats") else {}
print("SERVE_TPU_TSDF_BATCHED", json.dumps(out), flush=True)
if hasattr(ex, "close"):
    ex.close()
