"""Phase split of the c2f fused-march raycast (148.3 ms at 640x480,
128^3 -- tsdf_timing2): where do the milliseconds go, and what do the
cheap knobs (coarse factor, refine steps, subvoxel off) buy?

Phases approximated with standalone programs:
  field     -- march_field build alone (elementwise + reshape)
  coarse    -- the coarse phase as an exact raycast at 160x120
  c2f_nosub -- coarse-to-fine with subvoxel_iters=0
  c2f       -- default (coarse=4, refine=12, subvoxel=1)
  c2f_8_16  -- coarse=8, refine=16 (4x fewer coarse rays)
  c2f_4_8   -- refine=8
Accuracy guard: mean |depth diff| vs the default c2f on valid pixels,
plus 24-frame tracked drift for the winning variant.

Memoization-proof (gotcha 2/12): distinct pose jitter per call, fresh
process, volume device-resident (realistic: the tracker never re-uploads
it). Run from /root/repo:  python - < tools/tpu/raycast_phases.py
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

print("devices:", jax.devices(), flush=True)
seq = tum.TumSequence.open("/root/repo/.data/synth640")
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
intr_c = camera.Intrinsics(fx=intr.fx / 4, fy=intr.fy / 4,
                           cx=(intr.cx + 0.5) / 4 - 0.5,
                           cy=(intr.cy + 0.5) / 4 - 0.5,
                           width=160, height=120)
cfg = tsdf.TsdfConfig()
res = {}


def record(key, value):
    res[key] = value
    print(f"partial {key}: {value}", flush=True)


# Build a realistic volume: fuse 8 frames at GT poses.
gt = seq.groundtruth_trajectory().poses
rel0 = np.linalg.inv(gt[0])
vol = tsdf.init_volume(cfg)
integ = jax.jit(lambda v, d, T: tsdf.integrate(v, d, T, intr, cfg))
for i in range(8):
    T = jnp.asarray((rel0 @ gt[i]).astype(np.float32))
    vol = integ(vol, jnp.asarray(seq.depth(i), jnp.float32), T)
np.asarray(vol.tsdf[0, 0, :2])

# + T[0, 3] salt: distinct execution per call (gotcha 2), ~free.
field_fn = jax.jit(lambda v, T: tsdf.march_field(v).reshape(
    cfg.resolution, -1).sum(axis=1) + T[0, 3])
coarse_fn = jax.jit(lambda v, T: tsdf.raycast(v, T, intr_c, cfg))
# NOTE: raycast_coarse must be set IN the config (the first probe run
# left it at 1 for three variants, silently measuring the exact march).
variants = {
    "c2f": cfg._replace(raycast_coarse=4),
    "c2f_nosub": cfg._replace(raycast_coarse=4, subvoxel_iters=0),
    "c2f_8_16": cfg._replace(raycast_coarse=8, refine_steps=16),
    "c2f_4_8": cfg._replace(raycast_coarse=4, refine_steps=8),
}
ray_fns = {
    k: jax.jit(lambda v, T, c=c: tsdf.raycast_coarse_to_fine(
        v, T, intr, c, coarse=c.raycast_coarse, refine_steps=c.refine_steps))
    for k, c in variants.items()
}

poses = [jnp.asarray(se3.exp(jnp.asarray(
    np.r_[1e-4 * (i + 1), 0, 0, 0, 2e-4 * (i + 1), 0], np.float32)))
    for i in range(16)]

# warm compiles
np.asarray(field_fn(vol, poses[0]))
np.asarray(coarse_fn(vol, poses[0]))
ref_depth = None
for k in ray_fns:
    out = np.asarray(ray_fns[k](vol, poses[0]))
    if k == "c2f":
        ref_depth = out
    else:
        valid = (out > 0) & (ref_depth > 0)
        record(f"{k}_absdiff_mm", round(float(
            np.abs(out - ref_depth)[valid].mean()) * 1000, 3))
        record(f"{k}_validfrac_vs_c2f", round(
            float((out > 0).sum() / max((ref_depth > 0).sum(), 1)), 4))


def timeit(fn, tag, n=6, off=0):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        r = fn(vol, poses[off + i])
        np.asarray(r)
        ts.append((time.perf_counter() - t0) * 1e3)
    record(tag + "_ms", round(statistics.median(ts), 2))


timeit(field_fn, "field", off=0)
timeit(coarse_fn, "coarse160", off=2)
timeit(ray_fns["c2f"], "c2f", off=4)
timeit(ray_fns["c2f_nosub"], "c2f_nosub", off=6)
timeit(ray_fns["c2f_8_16"], "c2f_8_16", off=8)
timeit(ray_fns["c2f_4_8"], "c2f_4_8", off=10)

print("RAYCAST_PHASES", json.dumps(res), flush=True)
