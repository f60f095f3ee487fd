"""On-TPU serving with raw uint16 frames: 8 sessions x 16 frames at
640x480 through the BatchedExecutor -- f32 rounds vs u16 rounds (half
the staged upload) vs u16 windowed (4-frame chunks). One process;
distinct per-session/per-round inputs + host materialization (gotcha
2/11). Compare against serve_tpu_batched.py's round-4 wave-1 numbers
(f32: serialized 486 / batched 327 / window 522.6 ms per round-of-8).

Run from /root/repo:  python - < tools/tpu/serve_tpu_u16.py
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

print("devices:", jax.devices(), flush=True)
S, F = 8, 16
seq = tum.TumSequence.open("/root/repo/.data/synth640")
base = np.stack([seq.depth_raw(i) for i in range(F)]).astype(np.int32)
rng = np.random.RandomState(0)
# per-session distinct streams: +-1 count jitter keeps every input unique
raw = [np.clip(base + rng.randint(-1, 2, (F, 1, 1)), 0, 65535)
       .astype(np.uint16) for _ in range(S)]
scale = 1.0 / tum.DEPTH_SCALE
f32 = [r.astype(np.float32) * np.float32(scale) for r in raw]
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
out = {}


def run_batched(frames, tag, window=None):
    ex = BatchedExecutor(BatchingConfig(intrinsics=intr, capacity=S,
                                        window=4, depth_scale=scale))
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

    def post_windows(f0, n):
        ths = []
        for s in range(S):
            th = threading.Thread(target=lambda s=s: sess[s].process_window(
                [frames[s][f] for f in range(f0, f0 + n)],
                [float(f) for f in range(f0, f0 + n)], window=4))
            th.start()
            ths.append(th)
        for th in ths:
            th.join()

    if window:
        for s in range(S):
            sess[s].process(frames[s][0], 0.0)
        post_windows(1, 4)  # compile
        t0 = time.perf_counter()
        post_windows(5, 4)
        post_windows(9, 4)
        ms = (time.perf_counter() - t0) * 1e3 / 8
    else:
        post_all(0)
        post_all(1)
        t0 = time.perf_counter()
        for f in range(2, F):
            post_all(f)
        ms = (time.perf_counter() - t0) * 1e3 / (F - 2)
    out[tag] = round(ms, 2)
    print(f"partial {tag}: {ms:.2f} ms/round-of-8", flush=True)
    ex.close()


run_batched(f32, "batched_f32_ms_per_round")
run_batched(raw, "batched_u16_ms_per_round")
run_batched(raw, "batched_u16_window_ms_per_round", window=4)
print("SERVE_TPU_U16", json.dumps(out), flush=True)
