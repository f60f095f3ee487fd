"""On-TPU TSDF timing (CLAUDE.md pending item 'TSDF per-frame + windowed
step timing'): times integrate / raycast exact / raycast c2f /
full tracked step / windowed step at 640x480, 128^3 x 4 cm defaults,
plus final-pose drift vs ground truth on the synth640 sequence.

Memoization-proof per gotcha 2: every timed call gets DISTINCT inputs
(different frames / jittered poses) and materializes via np.asarray.

Run from /root/repo:  python - < tools/tpu/tsdf_tpu_timing.py
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
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.mapping import tsdf
from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

print("devices:", jax.devices(), flush=True)
seq = tum.TumSequence.open("/root/repo/.data/synth640")
N = 24
depths = [np.asarray(seq.depth(i), np.float32) for i in range(N)]
gt_poses = seq.groundtruth_trajectory().poses  # 4x4 world_from_cam
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
cfg = tsdf.TsdfConfig()  # 128^3 x 4 cm, c2f raycast default
cfg_exact = cfg._replace(raycast_coarse=1)
cfg_c2f = cfg._replace(raycast_coarse=4)

# --- primitive op timings -------------------------------------------------
integ = jax.jit(lambda v, d, T: tsdf.integrate(v, d, T, intr, cfg))
ray = {}
for tag, c in (("exact", cfg_exact), ("c2f", cfg_c2f)):
    if tag == "c2f":
        ray[tag] = jax.jit(lambda v, T, c=c: tsdf.raycast_coarse_to_fine(
            v, T, intr, c))
    else:
        ray[tag] = jax.jit(lambda v, T, c=c: tsdf.raycast(v, T, intr, c))

vol = tsdf.init_volume(cfg)
eye = jnp.eye(4, dtype=jnp.float32)
# warm compiles
vol = integ(vol, jnp.asarray(depths[0]), eye)
for tag in ray:
    np.asarray(ray[tag](vol, eye))


def timeit(fn, inputs, materialize):
    ts = []
    for x in inputs:
        t0 = time.perf_counter()
        r = fn(*x)
        materialize(r)
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


# distinct inputs per call: successive frames + tiny distinct pose jitter
jit_poses = []
for i in range(6):
    tw = jnp.asarray(np.r_[np.zeros(3), 1e-4 * (i + 1), 0, 0], jnp.float32)
    jit_poses.append(se3.exp(tw))

res = {}


def record(key, value):
    # Incremental print: a late crash must not discard earlier timings
    # (the whole run costs minutes of serialized tunnel time).
    res[key] = value
    print(f"partial {key}: {value}", flush=True)


record("integrate_ms", timeit(
    integ, [(vol, jnp.asarray(depths[i]), jit_poses[i]) for i in range(6)],
    lambda v: np.asarray(v.tsdf[0, 0, :4])))
for tag in ("exact", "c2f"):
    record(f"raycast_{tag}_ms", timeit(
        ray[tag], [(vol, jit_poses[i]) for i in range(6)],
        lambda r: np.asarray(r[0]) if isinstance(r, tuple) else np.asarray(r)))

# --- full tracked step, per-frame ------------------------------------------
tr = TsdfTracker(intr=intr, volume=cfg_c2f)
ts = []
for i in range(N):
    t0 = time.perf_counter()
    tr.process(depths[i], seq.timestamp(i))  # materializes stats internally
    ts.append((time.perf_counter() - t0) * 1e3)
record("tracked_step_ms", statistics.median(ts[3:]))

# final-pose drift vs GT (both relative to frame 0)
rel_gt = np.linalg.inv(gt_poses[0]) @ gt_poses[N - 1]
drift = np.linalg.norm(tr.pose[:3, 3] - rel_gt[:3, 3]) * 1000
record("final_drift_mm", float(drift))

# --- windowed step ---------------------------------------------------------
tr2 = TsdfTracker(intr=intr, volume=cfg_c2f)
tr2.process(depths[0], seq.timestamp(0))
# first window pays the scan compile; time only the steady chunks after
tr2.process_window(depths[1:9], [seq.timestamp(i) for i in range(1, 9)],
                   window=8)
t0 = time.perf_counter()
tr2.process_window(depths[9:N], [seq.timestamp(i) for i in range(9, N)],
                   window=8)
record("windowed_step_ms", (time.perf_counter() - t0) * 1e3 / (N - 9))
drift2 = np.linalg.norm(tr2.pose[:3, 3] - rel_gt[:3, 3]) * 1000
record("windowed_drift_mm", float(drift2))

print("TSDF_TPU_TIMING", json.dumps(res), flush=True)
