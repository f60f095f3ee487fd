"""On-TPU dense-serving A/B with the MODERN render config: 8 TSDF
sessions at 640x480, 96^3 x 4 cm, c2f raycast (coarse=4, refine=8) --
serialized TsdfTrackers vs BatchedExecutor TSDF slots, at
RST_TRACK_SCALE in {1, 2}.

Round 3 measured dense batched serving SLOWER than serialized (8.06 s vs
11.65 s/round-of-8) because one vmapped 128^3 EXACT raycast over 8
volumes spills; the fused march field + c2f + track_scale shrink the
vmapped render by an order of magnitude, so the verdict deserves a
re-measure. One variant per fresh process (gotcha 12):

  for s in 1 2; do RST_TRACK_SCALE=$s python - \
      < tools/tpu/serve_tpu_tsdf_ts.py; done

Memoization-proof per gotcha 2: distinct per-session streams and frames,
stats materialize every step.
"""
import json
import os
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

SCALE = int(os.environ.get("RST_TRACK_SCALE", "1"))
print("devices:", jax.devices(), "track_scale:", SCALE, flush=True)
S, F = 8, 12
seq = tum.TumSequence.open("/root/repo/.data/synth640")
base = np.stack([np.asarray(seq.depth(i), np.float32) for i in range(F)])
rng = np.random.RandomState(0)
frames = [base + np.float32(2e-4) * rng.randn(F, 1, 1).astype(np.float32)
          for _ in range(S)]
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
vol_cfg = tsdf.sized_config(resolution=96, voxel_size=0.04)._replace(
    raycast_coarse=4, track_scale=SCALE)
out = {"track_scale": SCALE}

# --- serialized: one TsdfTracker per session, round-robin -------------------
trackers = [TsdfTracker(intr=intr, volume=vol_cfg) for _ in range(S)]
for s in range(S):
    trackers[s].process(frames[s][0], 0.0)
    trackers[s].process(frames[s][1], 1.0)  # compiles the fused step
t0 = time.perf_counter()
for f in range(2, F):
    for s in range(S):
        trackers[s].process(frames[s][f], float(f))
serialized = (time.perf_counter() - t0) * 1e3 / (F - 2)
out["serialized_ms_per_round"] = serialized
print("partial serialized ms/round-of-8:", serialized, flush=True)
del trackers

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


post_all(0)
post_all(1)
t0 = time.perf_counter()
for f in range(2, F):
    post_all(f)
batched = (time.perf_counter() - t0) * 1e3 / (F - 2)
out["batched_ms_per_round"] = batched
out["speedup"] = serialized / batched
print("SERVE_TPU_TSDF_TS", json.dumps(out), flush=True)
if hasattr(ex, "close"):
    ex.close()
