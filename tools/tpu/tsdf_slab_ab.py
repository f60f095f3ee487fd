"""On-TPU A/B of TsdfConfig.integrate_slab on a NEAR-FIELD scene.

The slab engages only when the frame's frustum AABB fits the static S^3
sub-grid: on synth640 (depth to 4.0 m filling the default 5.12 m
volume) it falls back to the full pass every frame and is a no-op
(measured round 5). This scene bounds depth at a 2.2 m wall with
spheres inside 2 m, the close-range indoor regime the RealSense
actually serves -- the frustum AABB spans ~72-86 voxels, so S=96 holds
every frame and the integrate visits (96/128)^3 = 42% of the volume.

ONE VARIANT PER FRESH PROCESS (gotcha 12); select with
RST_INTEGRATE_SLAB (0 | 96) and RST_TRACK_SCALE (1 | 4):
  for s in 0 96; do RST_INTEGRATE_SLAB=$s python - \
      < tools/tpu/tsdf_slab_ab.py; done
"""
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.mapping import tsdf
from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

SLAB = int(os.environ.get("RST_INTEGRATE_SLAB", "0"))
SCALE = int(os.environ.get("RST_TRACK_SCALE", "1"))
print("devices:", jax.devices(), "slab:", SLAB, "scale:", SCALE,
      flush=True)

W, H = 640, 480
INTR = camera.Intrinsics(fx=W * 0.8, fy=W * 0.8, cx=(W - 1) / 2,
                         cy=(H - 1) / 2, width=W, height=H)
rng = np.random.RandomState(9)
n = 14
centers = np.stack([
    rng.uniform(-0.9, 0.9, n),
    rng.uniform(-0.5, 0.6, n),
    rng.uniform(0.9, 1.9, n),
], 1).astype(np.float32)
scene = synthetic.Scene(
    sphere_centers=jnp.asarray(centers),
    sphere_radii=jnp.asarray(rng.uniform(0.15, 0.3, n).astype(np.float32)),
    floor_y=0.85, wall_z=2.2,
)
N = 24
depths, gt = synthetic.render_trajectory(INTR, N, scene=scene, seed=4,
                                         step_scale=0.008)
depths = [np.asarray(depths[i], np.float32) for i in range(N)]

cfg = tsdf.TsdfConfig()._replace(raycast_coarse=4, track_scale=SCALE,
                                 integrate_slab=SLAB)
res = {"integrate_slab": SLAB, "track_scale": SCALE}

tr = TsdfTracker(intr=INTR, volume=cfg)
ts = []
for i in range(N):
    t0 = time.perf_counter()
    tr.process(depths[i], float(i))
    ts.append((time.perf_counter() - t0) * 1e3)
res["tracked_step_ms"] = statistics.median(ts[3:])
rel_gt = np.linalg.inv(np.asarray(gt[0])) @ np.asarray(gt[N - 1])
res["final_drift_mm"] = float(
    np.linalg.norm(tr.pose[:3, 3] - rel_gt[:3, 3]) * 1000)

tr2 = TsdfTracker(intr=INTR, volume=cfg)
tr2.process(depths[0], 0.0)
tr2.process_window(depths[1:9], [float(i) for i in range(1, 9)], window=8)
t0 = time.perf_counter()
tr2.process_window(depths[9:N], [float(i) for i in range(9, N)], window=8)
res["windowed_step_ms"] = (time.perf_counter() - t0) * 1e3 / (N - 9)

print("TSDF_SLAB_AB", json.dumps(res), flush=True)
