"""Measure the two windowed-paradox fixes on the real chip, one process:

  kf_pf            per-frame baseline (f32), same as window_bisect2
  kf_win4_trunc    window=4 truncating (old mode, re-timed for in-process
                   comparability)
  kf_win4_multi    window=4 multi-event (truncate_at_events=False): every
                   window consumes all W frames -- exactly 1/W dispatches
  kf_win4_u16      multi-event + RAW uint16 frames (depth_scale=1/5000):
                   half the host->device upload bytes per dispatch
  kf_win8_u16      same at W=8

All timings fence via the class API's own stats materialization; frames
are distinct per call (gotcha 2). Run from /root/repo:
  python - < tools/tpu/window_final.py
"""
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

from realsensetracker_tpu.data import tum
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.tracking.keyframe import KeyframeTracker

print("devices:", jax.devices(), flush=True)
seq = tum.TumSequence.open("/root/repo/.data/synth640")
F = 61
frames = [np.asarray(seq.depth(i), np.float32) for i in range(F)]
raw = [seq.depth_raw(i) for i in range(F)]
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
res = {}


def record(key, value):
    res[key] = value
    print(f"partial {key}: {value}", flush=True)


def run_windowed(tr, fr, W, truncate):
    """Warm one window program, then time the rest of the sequence."""
    tr.process(fr[0], 0.0)
    tr.process_window(fr[1:1 + W], [float(i) for i in range(1, 1 + W)],
                      pad_to=W, truncate_at_events=truncate)
    ts, i, dispatches = [], 1 + W, 0
    while i < F:
        chunk = fr[i:i + W]
        t0 = time.perf_counter()
        out = tr.process_window(chunk,
                                [float(i + k) for k in range(len(chunk))],
                                pad_to=W, truncate_at_events=truncate)
        ts.append(((time.perf_counter() - t0) * 1e3, len(out)))
        dispatches += 1
        i += len(out)
    per_frame = [t / n for t, n in ts]
    return (statistics.median(per_frame), dispatches, i - (1 + W),
            statistics.median([t for t, _ in ts]))


# --- per-frame baseline ------------------------------------------------------
tr = KeyframeTracker(intr=intr)
tr.process(frames[0], 0.0)
tr.process(frames[1], 1.0)
ts = []
for f in range(2, F):
    t0 = time.perf_counter()
    tr.process(frames[f], float(f))
    ts.append((time.perf_counter() - t0) * 1e3)
record("kf_pf_ms", statistics.median(ts))

# --- windowed variants -------------------------------------------------------
for key, fr, W, trunc, scale in [
    ("kf_win4_trunc", frames, 4, True, None),
    ("kf_win4_multi", frames, 4, False, None),
    ("kf_win4_u16", raw, 4, False, 1.0 / tum.DEPTH_SCALE),
    ("kf_win8_u16", raw, 8, False, 1.0 / tum.DEPTH_SCALE),
]:
    kw = {} if scale is None else {"depth_scale": scale}
    t = KeyframeTracker(intr=intr, **kw)
    ms, disp, nfr, per_disp = run_windowed(t, fr, W, trunc)
    record(f"{key}_ms_per_frame", ms)
    record(f"{key}_dispatches", disp)
    record(f"{key}_frames", nfr)
    record(f"{key}_ms_per_dispatch", per_disp)

print("WINDOW_FINAL", json.dumps(res), flush=True)
