"""Measure the flagship 512-pair register_batch under pyramid-path
variants, attacking the 35 ms/dispatch of layout copies+reshapes the HLO
probe exposed (BENCHMARKS.md "Level-kernel roofline: CLOSED"):

  base        current: Pallas level kernel + reshape-based 2x2 downsample
  nokernel    XLA-composed levels (use_kernel=False)
  rwin        Pallas kernel + reduce_window downsample (f32 counts --
              kills the s32 convert copies AND the (H/2,2,W/2,2)
              batch-minor reshapes)
  nk_rwin     both

Each variant times 6 salted, host-materialized dispatches in one
process (same methodology as bench.py). Run: python - < tools/tpu/layout_probe.py
"""
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax import lax

from realsensetracker_tpu.align import projective
from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.ops import pyramid as pyr
from realsensetracker_tpu.parallel import batched

print("devices:", jax.devices(), flush=True)
intr = camera.TUM_FR1
cfg = projective.ProjectiveIcpConfig()
B = 512

scene = synthetic.default_scene(seed=0)
d0, d1, _ = synthetic.render_pair(
    intr, jnp.array([0.01, -0.005, 0.01, 0.005, -0.01, 0.005], jnp.float32),
    scene)
rng = np.random.RandomState(0)


def noisy(base):
    base = np.asarray(base)
    return jnp.concatenate([
        jnp.asarray(base[None] + 0.001 * rng.randn(
            min(128, B - i), *base.shape).astype(np.float32))
        for i in range(0, B, 128)
    ])


src, dst = noisy(d1), noisy(d0)

orig_downsample = pyr.downsample_depth
orig_use = pyr._use_pallas_kernel


def rwin_downsample(depth, valid):
    nd = depth.ndim
    win = (1,) * (nd - 2) + (2, 2)
    h, w = depth.shape[-2] // 2 * 2, depth.shape[-1] // 2 * 2
    d = jnp.where(valid, depth, 0.0)[..., :h, :w]
    m = valid[..., :h, :w].astype(jnp.float32)
    s = lax.reduce_window(d, 0.0, lax.add, win, win, "VALID")
    cnt = lax.reduce_window(m, 0.0, lax.add, win, win, "VALID")
    out_valid = cnt > 0.5
    out = jnp.where(out_valid, s / jnp.maximum(cnt, 1.0), 0.0)
    return out, out_valid


def timed(tag, use_kernel, downsample):
    pyr._use_pallas_kernel = (lambda _u: use_kernel)
    pyr.downsample_depth = downsample

    def step(s, d, salt):
        return batched.register_batch(s + salt, d + salt, intr, cfg).transform

    fn = jax.jit(step)
    np.asarray(fn(src, dst, jnp.float32(-1e-4)))  # compile+warm
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        np.asarray(fn(src, dst, jnp.float32((i + 1) * 1e-5)))
        ts.append((time.perf_counter() - t0) * 1e3)
    med = statistics.median(ts)
    print(f"partial {tag}: {med:.2f} ms/batch = "
          f"{B / med * 1e3:.1f} pairs/s", flush=True)
    return med


res = {}
try:
    res["base_ms"] = timed("base", True, orig_downsample)
    res["rwin_ms"] = timed("rwin", True, rwin_downsample)
    res["nokernel_ms"] = timed("nokernel", False, orig_downsample)
    res["nk_rwin_ms"] = timed("nk_rwin", False, rwin_downsample)
finally:
    pyr.downsample_depth = orig_downsample
    pyr._use_pallas_kernel = orig_use
for k in list(res):
    res[k.replace("_ms", "_pairs_s")] = round(B / res[k] * 1e3, 1)
print("LAYOUT_PROBE", json.dumps(res), flush=True)
