"""Round-5 re-probe of the Mosaic lowering blockers that park the fused
GN-step Pallas kernel, the in-kernel 2x2 downsample, and the layout-copy
elimination (BENCHMARKS.md "Fused GN-step Pallas kernel: status",
VERDICT r4 item 7).

Each probe is a minimal kernel reproducing one blocker, run in its OWN
subprocess (a compile-helper crash -- historically an HTTP 500 -- can
poison the process; the parent never imports jax and thus never holds
the TPU tunnel while children run, and children serialize). Prints one
PASS/FAIL line per probe plus a JSON summary.

Run from /root/repo:  python tools/tpu/mosaic_probe5.py
"""
import json
import subprocess
import sys

PROBES = {}


def probe(name):
    def deco(src):
        PROBES[name] = src
        return src
    return deco


COMMON = """
import sys
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:
    pltpu = None
print("devices:", jax.devices(), flush=True)
"""

# 1. Lane-axis dynamic gather (take_along_axis along the last axis) at
#    widths past one vreg. Blocker: compiled ONLY at W=128.
PROBES["lane_gather_w256"] = COMMON + """
W = 256
def k(x_ref, i_ref, o_ref):
    x = x_ref[...]
    idx = i_ref[...]
    o_ref[...] = jnp.take_along_axis(x, idx, axis=1)
x = jnp.arange(8 * W, dtype=jnp.float32).reshape(8, W)
idx = jnp.flip(jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), (8, W)),
               axis=1)
out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32))(x, idx)
np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[:, ::-1])
print("OK lane gather W=256")
"""

PROBES["lane_gather_w640"] = COMMON + """
W = 640
def k(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)
x = jnp.arange(8 * W, dtype=jnp.float32).reshape(8, W)
idx = jnp.flip(jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), (8, W)),
               axis=1)
out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32))(x, idx)
np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[:, ::-1])
print("OK lane gather W=640")
"""

# 2. Sublane-axis gather. Blocker: did not lower.
PROBES["sublane_gather"] = COMMON + """
def k(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)
x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
idx = jnp.flip(jnp.broadcast_to(
    jnp.arange(64, dtype=jnp.int32)[:, None], (64, 128)), axis=0)
out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(x, idx)
np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[::-1, :])
print("OK sublane gather")
"""

# 3. Cross-lane reshape (128, 16) -> (2048, 1). Blocker: compile-helper
#    crash (HTTP 500).
PROBES["reshape_cross_lane"] = COMMON + """
def k(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(2048, 1)
x = jnp.arange(128 * 16, dtype=jnp.float32).reshape(128, 16)
out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((2048, 1), jnp.float32))(x)
np.testing.assert_array_equal(np.asarray(out).ravel(),
                              np.asarray(x).ravel())
print("OK reshape (128,16)->(2048,1)")
"""

# 4a. Stride-2 lane compaction via slicing. Blocker: failed to lower.
PROBES["stride2_slice"] = COMMON + """
def k(x_ref, o_ref):
    o_ref[...] = x_ref[...][0::2, 0::2]
x = jnp.arange(16 * 256, dtype=jnp.float32).reshape(16, 256)
out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[::2, ::2])
print("OK stride-2 slice")
"""

# 4b. Stride-2 via (H, W/2, 2) reshape + index. Blocker: rejected.
PROBES["stride2_reshape"] = COMMON + """
def k(x_ref, o_ref):
    x = x_ref[...]
    o_ref[...] = x.reshape(16, 128, 2)[:, :, 0][0::2]
x = jnp.arange(16 * 256, dtype=jnp.float32).reshape(16, 256)
out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[::2, ::2])
print("OK stride-2 reshape")
"""

# 5. Output layout: can a kernel WRITE a (4, H, W) plane table from a
#    (H, W) block without XLA inserting boundary copies? Minimal check
#    that a transposed-ish output block map lowers at all.
PROBES["multi_out_layout"] = COMMON + """
H, W = 64, 128
def k(x_ref, o_ref):
    x = x_ref[...]
    o_ref[0, ...] = x
    o_ref[1, ...] = x * 2.0
    o_ref[2, ...] = x + 1.0
    o_ref[3, ...] = x - 1.0
x = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((4, H, W), jnp.float32))(x)
np.testing.assert_array_equal(np.asarray(out)[1], np.asarray(x) * 2.0)
print("OK 4-plane output write")
"""


def _error_line(out: str) -> str:
    """The most informative line of a failed probe's output: the last
    exception line, skipping JAX's traceback-filtering banner."""
    lines = [ln.strip() for ln in out.strip().splitlines() if ln.strip()]
    for ln in reversed(lines):
        low = ln.lower()
        if ("removed its internal frames" in low
                or low.startswith("set jax_traceback")
                or ln.startswith("-")):
            continue
        if ("error" in low or "unsupported" in low or "unimplemented"
                in low or "not implemented" in low or "exception" in low
                or "failed" in low):
            return ln[:240]
    return lines[-1][:240] if lines else ""


def main():
    results = {}
    for name, src in PROBES.items():
        try:
            r = subprocess.run([sys.executable, "-"], input=src,
                               text=True, capture_output=True,
                               timeout=420, cwd="/root/repo")
            ok = r.returncode == 0
            out = r.stdout + r.stderr
        except subprocess.TimeoutExpired as e:
            ok = False
            out = ((e.stdout or "") if isinstance(e.stdout, str) else ""
                   ) + "\nTIMEOUT after 420s (compile hang)"
        msg = (out.strip().splitlines()[-1][:160] if ok
               else _error_line(out))
        results[name] = {"ok": ok, "msg": msg}
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}", flush=True)
    print("MOSAIC_PROBE5", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
