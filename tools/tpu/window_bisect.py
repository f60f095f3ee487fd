"""Bisect WHY windowed scans are 3-15x slower per frame than per-frame
dispatches ON THE REAL CHIP (wave-1 campaign, 2026-08-19: slam window=4
150.4 ms/frame vs 42.1 per-frame; streams window 11 vs 188 FPS) when the
same programs are FASTER on CPU (BENCHMARKS.md: 1.8 vs 3.2 ms/frame).

Hypotheses, cheapest-to-test first (everything in ONE process, distinct
inputs per timed call + np.asarray of a small output per call, CLAUDE.md
gotchas 2/11):

  H1 eager output transfer: the axon relay ships ALL program outputs
     back through the tunnel even if the host never materializes them.
     The window program returns the full latched keyframe pyramid
     (~6.5 MB f32 at 640x480); the per-frame step returns the same but
     may hide it via dispatch pipelining.
     Test: same-compute programs returning scalar-only vs scalar+big.
  H2 the scan BODY compiles worse than the standalone step (gathers
     against a loop-carried operand, carry double-buffering, lost
     fusions). Test: stats-only window wrapper (XLA DCEs the unused
     pyramid outputs) vs per-frame step; scan-of-pyramid and
     scan-of-ICP-only decompositions.
  H3 the keyframe-latch carry (tree-select over the whole pyramid per
     iteration). Test: ICP-scan with the destination INVARIANT vs the
     full window body.

Run from /root/repo:  python - < tools/tpu/window_bisect.py
"""
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from functools import partial

from realsensetracker_tpu.align import projective
from realsensetracker_tpu.data import tum
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.ops.pyramid import build_pyramid
from realsensetracker_tpu.tracking import keyframe as kf_mod

print("devices:", jax.devices(), flush=True)

seq = tum.TumSequence.open("/root/repo/.data/synth640")
N = 24
frames = [np.asarray(seq.depth(i), np.float32) for i in range(N)]
intr = camera.Intrinsics(fx=640 * 0.8, fy=640 * 0.8, cx=(640 - 1) / 2,
                         cy=(480 - 1) / 2, width=640, height=480)
cfg = projective.ProjectiveIcpConfig()
res = {}


def record(key, value):
    res[key] = value
    print(f"partial {key}: {value}", flush=True)


def timeit(fn, arglists, materialize):
    """Median ms over warm calls; every call gets DISTINCT args and is
    fenced by materializing a small slice of its result."""
    materialize(fn(*arglists[0]))  # compile + warm
    ts = []
    for args in arglists[1:]:
        t0 = time.perf_counter()
        materialize(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


# --- H1: output size, identical compute -------------------------------------
@jax.jit
def compute_small(d):
    y = jnp.tanh(d * 1.7 + 0.3)
    return jnp.sum(y)


@jax.jit
def compute_big(d):
    y = jnp.tanh(d * 1.7 + 0.3)
    # Same compute + a large (H, W) output the host will NOT materialize.
    return jnp.sum(y), y


small_args = [(jnp.asarray(frames[i] + np.float32(i) * 1e-5),)
              for i in range(8)]
record("h1_small_out_ms", timeit(compute_small, small_args,
                                 lambda r: np.asarray(r)))
record("h1_big_out_ms", timeit(compute_big, small_args,
                               lambda r: np.asarray(r[0])))

# --- per-frame fused step: full outputs vs stats-only ------------------------
kf_levels, _ = build_pyramid(jnp.asarray(frames[0]), intr, len(cfg.iters),
                             cfg.min_depth, cfg.max_depth)
kf_levels = tuple(kf_levels)
kf_pose = jnp.eye(4, dtype=jnp.float32)
pose = jnp.eye(4, dtype=jnp.float32)

step_args = [(jnp.asarray(frames[i]), kf_levels, kf_pose, pose)
             for i in range(2, 14)]
record("step_full_ms", timeit(
    partial(kf_mod._fused_track_step, intr=intr, cfg=cfg),
    step_args, lambda r: np.asarray(r[2])))


@jax.jit
def step_stats(depth, kf_lv, kf_p, p):
    return kf_mod._fused_track_step(depth, kf_lv, kf_p, p,
                                    intr=intr, cfg=cfg)[2]


record("step_stats_ms", timeit(step_stats, step_args,
                               lambda r: np.asarray(r)))

# --- window W=4: full outputs vs stats-only ----------------------------------
thresholds = jnp.asarray([0.2, 0.15, 0.15, 0.6], jnp.float32)
max_fails = jnp.int32(2)
W = 4


def win_args(k):
    stack = np.stack(frames[2 + k * W:2 + (k + 1) * W])
    return (jnp.asarray(stack), kf_levels, kf_pose, pose,
            jnp.int32(0), jnp.int32(0), thresholds, max_fails)


wargs = [win_args(k) for k in range(5)]
record("win4_full_ms_per_frame", timeit(
    partial(kf_mod._fused_track_window, intr=intr, cfg=cfg),
    wargs, lambda r: np.asarray(r[3])) / W)


@jax.jit
def win4_stats(depths, kf_lv, kf_p, p, s0, f0, th, mf):
    return kf_mod._fused_track_window(depths, kf_lv, kf_p, p, s0, f0,
                                      th, mf, intr=intr, cfg=cfg)[3]


record("win4_stats_ms_per_frame", timeit(win4_stats, wargs,
                                         lambda r: np.asarray(r)) / W)

# --- decomposition: scan-of-pyramid, scan-of-ICP (invariant dst) -------------
@jax.jit
def pyr_scan(depths):
    def body(c, d):
        levels, _ = build_pyramid(d, intr, len(cfg.iters),
                                  cfg.min_depth, cfg.max_depth)
        # touch every level so nothing is DCE'd
        s = sum(jnp.sum(lv.packed[:, ::64, ::64]) for lv in levels)
        return c + s, s

    return jax.lax.scan(body, jnp.float32(0.0),
                        depths)[1]


record("pyr_scan4_ms_per_frame", timeit(
    pyr_scan, [(a[0],) for a in wargs], lambda r: np.asarray(r)) / W)


@jax.jit
def icp_scan(depths, dst_levels):
    """build_pyramid + ICP per frame, dst INVARIANT, carry = pose only."""
    def body(p, d):
        levels, intrs = build_pyramid(d, intr, len(cfg.iters),
                                      cfg.min_depth, cfg.max_depth)
        init = se3.compose(se3.inverse(kf_pose), p)
        icp = projective.projective_icp(
            tuple(levels), dst_levels, tuple(intrs),
            init_transform=init, cfg=cfg)
        new_pose = se3.accumulate(kf_pose, icp.transform)
        return new_pose, jnp.stack([icp.rmse, icp.inlier_fraction])

    return jax.lax.scan(body, pose, depths)[1]


record("icp_scan4_ms_per_frame", timeit(
    icp_scan, [(a[0], kf_levels) for a in wargs],
    lambda r: np.asarray(r)) / W)

print("WINDOW_BISECT", json.dumps(res), flush=True)
