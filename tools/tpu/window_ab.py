"""Resolve the 3x gap between window_final.py (class KeyframeTracker,
u16 W=4: 84.9 ms/dispatch) and rs_replay --window 4 (266 ms/dispatch,
replay_tpu_u16.py) -- same machine, same nominal work. Hypotheses:
 (a) relay dedupes repeated identical uploads: window_final re-used the
     SAME frame arrays already uploaded by its per-frame phase, so its
     windows may have paid no upload at all;
 (b) facade overhead;
 (c) keyframe-event density of the replay sequence.
One process, all fenced by the class API's stats materialization.
Run: python - < tools/tpu/window_ab.py
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
from realsensetracker_tpu.tracking.keyframe import KeyframeTracker

print("devices:", jax.devices(), flush=True)
seq = tum.TumSequence.open("/root/repo/.data/synth640")
F = 61
raw = [seq.depth_raw(i) for i in range(F)]
# fresh variants: add tiny random u16 jitter so every window's bytes are
# unique (defeats any relay content dedup)
rng = np.random.RandomState(0)
fresh = [
    (r.astype(np.int32) + rng.randint(0, 3, r.shape)).astype(np.uint16)
    for r in raw
]
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
scale = 1.0 / tum.DEPTH_SCALE
res = {}
W = 4


def record(k, v):
    res[k] = v
    print(f"partial {k}: {v}", flush=True)


def time_windows(tr, frames, tag, via_facade=False):
    tr.process(frames[0], 0.0) if not via_facade else tr.process(frames[0], 0.0)
    # warm the window program
    kw = dict(window=W) if via_facade else dict(pad_to=W,
                                                truncate_at_events=False)
    tr.process_window(frames[1:1 + W], [float(i) for i in range(1, 1 + W)],
                      **kw)
    ts, i = [], 1 + W
    while i + W <= F:
        chunk = frames[i:i + W]
        t0 = time.perf_counter()
        out = tr.process_window(chunk,
                                [float(i + k) for k in range(len(chunk))],
                                **kw)
        ts.append((time.perf_counter() - t0) * 1e3)
        i += len(out)
    record(tag, round(statistics.median(ts), 2))


# (a/c) class tracker, REUSED arrays (window_final conditions)
t1 = KeyframeTracker(intr=intr, depth_scale=scale)
time_windows(t1, raw, "class_reused_ms_per_dispatch")

# (a) class tracker, FRESH unique arrays every dispatch
t2 = KeyframeTracker(intr=intr, depth_scale=scale)
time_windows(t2, fresh, "class_fresh_ms_per_dispatch")

# (b) facade, fresh arrays (rs_replay conditions minus the stream)
t3 = Tracker(TrackerConfig(intrinsics=intr, method="keyframe",
                           depth_scale=scale))
time_windows(t3, fresh, "facade_fresh_ms_per_dispatch", via_facade=True)

print("WINDOW_AB", json.dumps(res), flush=True)
