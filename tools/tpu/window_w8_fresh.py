"""Clean w8 facade number: ONE variant in a fresh process (gotcha 12),
fresh unique u16 inputs -- window_final.py's w8 slot was confounded by
upload dedup (reused arrays) and process age.
Run from /root/repo:  python - < tools/tpu/window_w8_fresh.py
"""
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

from realsensetracker_tpu.api import Tracker, TrackerConfig
from realsensetracker_tpu.data import tum
from realsensetracker_tpu.geometry import camera

print("devices:", jax.devices(), flush=True)
seq = tum.TumSequence.open("/root/repo/.data/synth640")
F = 89
raw = [seq.depth_raw(i) for i in range(F)]
rng = np.random.RandomState(3)
fresh = [
    (r.astype(np.int32) + rng.randint(0, 3, r.shape)).astype(np.uint16)
    for r in raw
]
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
W = 8
tr = Tracker(TrackerConfig(intrinsics=intr, method="keyframe",
                           depth_scale=1.0 / tum.DEPTH_SCALE))
tr.process(fresh[0], 0.0)
tr.process_window(fresh[1:1 + W], [float(i) for i in range(1, 1 + W)],
                  window=W)  # warm the scan program
ts, i = [], 1 + W
while i + W <= F:
    chunk = fresh[i:i + W]
    t0 = time.perf_counter()
    out = tr.process_window(chunk, [float(i + k) for k in range(len(chunk))],
                            window=W)
    ts.append((time.perf_counter() - t0) * 1e3)
    i += len(out)
med = statistics.median(ts)
print("W8_FRESH", json.dumps({
    "w8_ms_per_dispatch": round(med, 2),
    "w8_ms_per_frame": round(med / W, 2),
    "dispatches": len(ts),
}), flush=True)
