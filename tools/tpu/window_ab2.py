"""Order-reversed control for window_ab.py: facade FIRST, class SECOND,
facade AGAIN last -- separates real facade overhead from the relay's
process-state drift (gotcha 11: dispatch cost grows with process age).
All fresh unique u16 arrays. Run: python - < tools/tpu/window_ab2.py
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
rng = np.random.RandomState(1)


def fresh():
    return [
        (r.astype(np.int32) + rng.randint(0, 3, r.shape)).astype(np.uint16)
        for r in raw
    ]


intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
scale = 1.0 / tum.DEPTH_SCALE
res = {}
W = 4


def time_windows(tr, frames, tag, via_facade=False):
    tr.process(frames[0], 0.0)
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
    med = round(statistics.median(ts), 2)
    res[tag] = med
    print(f"partial {tag}: {med}", flush=True)


time_windows(Tracker(TrackerConfig(intrinsics=intr, method="keyframe",
                                   depth_scale=scale)),
             fresh(), "facade_first_ms", via_facade=True)
time_windows(KeyframeTracker(intr=intr, depth_scale=scale),
             fresh(), "class_second_ms")
time_windows(Tracker(TrackerConfig(intrinsics=intr, method="keyframe",
                                   depth_scale=scale)),
             fresh(), "facade_last_ms", via_facade=True)
print("WINDOW_AB2", json.dumps(res), flush=True)
