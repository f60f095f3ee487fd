"""On-TPU serving latency: /track vs /track_window (CLAUDE.md pending
item). One in-process TrackingService (keyframe tracker, 640x480), one
HTTP client; measures end-to-end per-frame latency (HTTP + decode +
device step + JSON) for per-frame posts vs 4- and 8-frame window posts.

Memoization-proof per gotcha 2: every frame is a distinct synth640
image, and the service materializes stats per dispatch.

Run from /root/repo:  python - < tools/tpu/serve_tpu_window.py
"""
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

from realsensetracker_tpu.api import service as svc_mod
from realsensetracker_tpu.api.config import TrackerConfig
from realsensetracker_tpu.api.tracker import Tracker
from realsensetracker_tpu.data import tum
from realsensetracker_tpu.geometry import camera

print("devices:", jax.devices(), flush=True)
F = 33
seq = tum.TumSequence.open("/root/repo/.data/synth640")
frames = [np.asarray(seq.depth(i), np.float32) for i in range(F)]
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)

svc = svc_mod.TrackingService(
    lambda: Tracker(TrackerConfig(intrinsics=intr, method="keyframe")),
)
url = f"http://127.0.0.1:{svc.port}"
out = {}

# --- /track, one frame per request ------------------------------------------
# Warm through frame 1: frame 0 seeds, frame 1 compiles the steady
# _fused_track_step program (30-90 s relay compile must stay out of the
# timed loop, gotcha 8). Warmup timeouts are 900 s: the first compile in
# a process that has ALREADY compiled several programs can exceed the
# 120 s post_frame default (measured: wave-1 run died exactly here).
svc_mod.post_frame(url, frames[0], 0.0, session="a", timeout=900.0)
svc_mod.post_frame(url, frames[1], 1.0, session="a", timeout=900.0)
lat = []
for f in range(2, F):
    t0 = time.perf_counter()
    svc_mod.post_frame(url, frames[f], float(f), session="a")
    lat.append((time.perf_counter() - t0) * 1e3)
out["track_ms_median"] = statistics.median(lat)
out["track_ms_p90"] = sorted(lat)[int(0.9 * len(lat))]
print("partial /track:", out, flush=True)

# --- /track_window, 4- and 8-frame chunks -----------------------------------
for win in (4, 8):
    sess = f"w{win}"
    svc_mod.post_frame(url, frames[0], 0.0, session=sess,
                       timeout=900.0)  # seed
    # window-program compile, outside the timed region
    svc_mod.post_window(url, frames[1:1 + win],
                        ts=[float(i) for i in range(1, 1 + win)],
                        session=sess, window=win, timeout=900.0)
    lat = []
    f = 1 + win
    while f + win <= F:
        t0 = time.perf_counter()
        svc_mod.post_window(url, frames[f:f + win],
                            ts=[float(i) for i in range(f, f + win)],
                            session=sess, window=win)
        lat.append((time.perf_counter() - t0) * 1e3 / win)
        f += win
    out[f"track_window{win}_ms_median"] = statistics.median(lat)
    print(f"partial /track_window w={win}:",
          out[f"track_window{win}_ms_median"], flush=True)

print("SERVE_TPU_WINDOW", json.dumps(out), flush=True)
svc.close()
