"""On-TPU A/B of TsdfConfig.track_scale (reduced-resolution frame-to-model
registration; integration stays full-res): tracked step per-frame +
windowed W=8 + 24-frame drift at 640x480, 128^3 x 4 cm, c2f raycast.

ONE VARIANT PER FRESH PROCESS (gotcha 12: upload-heavy dispatch cost
grows with process age; cross-variant comparisons inside one process
are biased against the later variant). Select the variant with the
RST_TRACK_SCALE env var; the driver shell serializes the runs:

  for s in 1 2 4; do RST_TRACK_SCALE=$s python - \
      < tools/tpu/tsdf_track_scale.py; done

RST_INTEGRATE_EVERY=N (default 1) additionally decimates the
integration pass (TsdfConfig.integrate_every) -- the round-5 lever for
pushing the windowed dense step under 33 ms/frame once track_scale has
removed the render+ICP cost and the full-res integrate is the floor.
RST_INTEGRATE_SLAB=S (default 0) restricts each integrate to the
frame's frustum AABB sub-grid (TsdfConfig.integrate_slab) -- the
losslesss alternative: same fused map, (V/S)^3-fold fewer gathers.

Memoization-proof per gotcha 2: distinct frames per call, results
materialized through the tracker's stats transfer.
"""
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

from realsensetracker_tpu.data import tum
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.mapping import tsdf
from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

SCALE = int(os.environ.get("RST_TRACK_SCALE", "2"))
EVERY = int(os.environ.get("RST_INTEGRATE_EVERY", "1"))
SLAB = int(os.environ.get("RST_INTEGRATE_SLAB", "0"))
U16 = int(os.environ.get("RST_U16", "0"))  # feed RAW uint16 counts (the
# production rs_replay ingestion: half the upload bytes, on-device
# conversion) instead of f32 meters
print("devices:", jax.devices(), "track_scale:", SCALE,
      "integrate_every:", EVERY, "integrate_slab:", SLAB,
      "u16:", U16, flush=True)

seq = tum.TumSequence.open("/root/repo/.data/synth640")
N = 24
if U16:
    depths = [seq.depth_raw(i) for i in range(N)]
    DEPTH_KW = {"depth_scale": 1.0 / tum.DEPTH_SCALE}
else:
    depths = [np.asarray(seq.depth(i), np.float32) for i in range(N)]
    DEPTH_KW = {}
gt_poses = seq.groundtruth_trajectory().poses
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
cfg = tsdf.TsdfConfig()._replace(raycast_coarse=4, track_scale=SCALE,
                                 integrate_every=EVERY,
                                 integrate_slab=SLAB)

res = {"track_scale": SCALE, "integrate_every": EVERY,
       "integrate_slab": SLAB, "u16": U16}


def record(key, value):
    res[key] = value
    print(f"partial {key}: {value}", flush=True)


# --- per-frame tracked step (FIRST slot of the fresh process) --------------
tr = TsdfTracker(intr=intr, volume=cfg, **DEPTH_KW)
ts = []
for i in range(N):
    t0 = time.perf_counter()
    tr.process(depths[i], seq.timestamp(i))  # materializes stats internally
    ts.append((time.perf_counter() - t0) * 1e3)
record("tracked_step_ms", statistics.median(ts[3:]))

rel_gt = np.linalg.inv(gt_poses[0]) @ gt_poses[N - 1]
record("final_drift_mm",
       float(np.linalg.norm(tr.pose[:3, 3] - rel_gt[:3, 3]) * 1000))

# --- windowed step (second slot; compare windowed numbers ACROSS the
# per-scale processes, which all place it second) ----------------------------
tr2 = TsdfTracker(intr=intr, volume=cfg, **DEPTH_KW)
tr2.process(depths[0], seq.timestamp(0))
tr2.process_window(depths[1:9], [seq.timestamp(i) for i in range(1, 9)],
                   window=8)  # pays the scan compile
t0 = time.perf_counter()
tr2.process_window(depths[9:N], [seq.timestamp(i) for i in range(9, N)],
                   window=8)
record("windowed_step_ms", (time.perf_counter() - t0) * 1e3 / (N - 9))
record("windowed_drift_mm",
       float(np.linalg.norm(tr2.pose[:3, 3] - rel_gt[:3, 3]) * 1000))

print("TSDF_TRACK_SCALE", json.dumps(res), flush=True)
