"""On-TPU 500-frame dense submap-atlas corridor (VERDICT r3 item 7):
long out-and-back trajectory at production 640x480, default 128^3 x 4 cm
submap volumes (extent 5.12 m, spawn radius 1.28 m), multiple handovers
outbound, reactivation on the return leg, then optimize_atlas -- per-
stage timing and endpoint error vs ground truth.

The corridor spans 8 m of +x translation (250 frames out, 250 back), so
a single fixed volume cannot hold it; the scene is a floor + back wall +
sphere field along the corridor (the tests/test_submaps.py geometry
scaled up).

Run from /root/repo:  python - < tools/tpu/submap_tpu.py

Round-5 re-measure at the HEAD optimization stack (the round-3 1083
ms/frame figure predates the fused march field, refine=8, and
track_scale / integrate_every): select the variant with env vars,
ONE FRESH PROCESS PER VARIANT (gotcha 12):
  RST_TRACK_SCALE=1|2|4 (default 1)  RST_INTEGRATE_EVERY=N (default 1)
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
from realsensetracker_tpu.mapping.submaps import (SubmapConfig,
                                                  SubmapTsdfTracker,
                                                  optimize_atlas)

print("devices:", jax.devices(), flush=True)
W, H = 640, 480
INTR = camera.Intrinsics(fx=W * 0.8, fy=W * 0.8, cx=(W - 1) / 2,
                         cy=(H - 1) / 2, width=W, height=H)
SPAN, F_OUT = 8.0, 250
F = 2 * F_OUT  # out-and-back: 250 out + 250 back (endpoint = start)

rng = np.random.RandomState(3)
n = 40
cx = np.linspace(-1.0, SPAN + 2.5, n)
centers = np.stack(
    [cx, rng.uniform(-0.3, 0.55, n), rng.uniform(0.9, 1.8, n)], 1
).astype(np.float32)
radii = rng.uniform(0.16, 0.32, n).astype(np.float32)
scene = synthetic.Scene(
    sphere_centers=jnp.asarray(centers),
    sphere_radii=jnp.asarray(radii),
    floor_y=0.9, wall_z=2.4,
)

# Out-and-back GT: linear +x sweep with mild per-frame jitter, reversed.
fwd = np.tile(np.eye(4, dtype=np.float32), (F_OUT, 1, 1))
fwd[:, 0, 3] = np.linspace(0.0, SPAN, F_OUT)
fwd[:, 1, 3] = 0.01 * rng.randn(F_OUT)
poses = np.concatenate([fwd, fwd[::-1]], axis=0)

print(f"rendering {F} frames at {W}x{H} ...", flush=True)
t0 = time.perf_counter()
CH = 50
depth_chunks = []
for k in range(0, F, CH):
    d, _ = synthetic.render_trajectory(
        INTR, CH, scene=scene, poses=jnp.asarray(poses[k:k + CH])
    )
    depth_chunks.append(np.asarray(d, np.float32))
depths = np.concatenate(depth_chunks)
print(f"rendered in {time.perf_counter() - t0:.1f}s", flush=True)

SCALE = int(os.environ.get("RST_TRACK_SCALE", "1"))
EVERY = int(os.environ.get("RST_INTEGRATE_EVERY", "1"))
SLAB = int(os.environ.get("RST_INTEGRATE_SLAB", "0"))
from realsensetracker_tpu.mapping import tsdf as tsdf_mod
vol_cfg = tsdf_mod.TsdfConfig()._replace(
    track_scale=SCALE, integrate_every=EVERY, integrate_slab=SLAB)
tracker = SubmapTsdfTracker(INTR, SubmapConfig(volume=vol_cfg))
res = {"track_scale": SCALE, "integrate_every": EVERY,
       "integrate_slab": SLAB}

# --- tracking (windowed, 8 frames per dispatch) ------------------------------
ms = []
t_all = time.perf_counter()
for k in range(0, F, 8):
    t0 = time.perf_counter()
    tracker.process_window(depths[k:k + 8],
                           [float(i) for i in range(k, k + 8)], window=8)
    ms.append((time.perf_counter() - t0) * 1e3 / min(8, F - k))
track_s = time.perf_counter() - t_all
res["track_ms_per_frame_median"] = statistics.median(ms[2:])
res["track_total_s"] = track_s
res["num_submaps"] = tracker.num_submaps
print(f"partial tracking: {res}", flush=True)

est = np.stack(tracker.trajectory.poses)
err = np.linalg.norm(est[:, :3, 3] - poses[:, :3, 3], axis=1) * 1000
res["ate_rmse_mm"] = float(np.sqrt(np.mean(err ** 2)))
res["endpoint_mm"] = float(err[-1])
res["max_err_mm"] = float(err.max())
print(f"partial pre-optimize: endpoint {err[-1]:.1f} mm, "
      f"ATE {res['ate_rmse_mm']:.1f} mm", flush=True)

# --- atlas loop closure -------------------------------------------------------
t0 = time.perf_counter()
loops = optimize_atlas(tracker)
res["optimize_s"] = time.perf_counter() - t0
res["loop_edges"] = int(loops)
est2 = np.stack(tracker.trajectory.poses)
err2 = np.linalg.norm(est2[:, :3, 3] - poses[:, :3, 3], axis=1) * 1000
res["ate_rmse_opt_mm"] = float(np.sqrt(np.mean(err2 ** 2)))
res["endpoint_opt_mm"] = float(err2[-1])
print("SUBMAP_TPU", json.dumps(res), flush=True)
