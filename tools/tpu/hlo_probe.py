"""Dump the TPU-optimized HLO of the flagship 512-pair register_batch
program and report the largest copy/reshape/fusion ops by output bytes.

Motivation (BENCHMARKS.md "Level-kernel roofline: CLOSED"): the xprof
device trace shows 25.3 ms of pure `copy` + 9.5 ms `reshape` per
512-pair dispatch (27% of device time) OUTSIDE the compute loops. This
probe maps those op names back to shapes/operands so we know what XLA
is materializing.

Run from /root/repo:  python - < tools/tpu/hlo_probe.py
"""
import re
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from realsensetracker_tpu.align import projective
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.parallel import batched

print("devices:", jax.devices(), flush=True)
intr = camera.TUM_FR1
cfg = projective.ProjectiveIcpConfig()

fn = jax.jit(lambda s, d: batched.register_batch(s, d, intr, cfg).transform)
shape = jax.ShapeDtypeStruct((512, 480, 640), jnp.float32)
print("lowering...", flush=True)
lowered = fn.lower(shape, shape)
print("compiling (relay, may take minutes)...", flush=True)
compiled = lowered.compile()
txt = compiled.as_text()
with open("/root/repo/.data/tpu_logs/flagship_512.hlo", "w") as f:
    f.write(txt)
print(f"HLO dumped: {len(txt)} chars", flush=True)


def shape_bytes(s):
    m = re.match(r"(\w+)\[([\d,]*)\]", s)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    width = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "u16": 2, "f16": 2,
             "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8}.get(dt, 4)
    return n * width


rows = []
for line in txt.splitlines():
    m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (\S+) (copy|reshape|transpose|"
                 r"bitcast)\(", line)
    if m:
        name, shp, op = m.groups()
        rows.append((shape_bytes(shp), op, name, line.strip()[:160]))
rows.sort(reverse=True)
print("\nLargest copy/reshape/transpose ops:")
for b, op, name, line in rows[:25]:
    print(f"{b/1e6:9.1f} MB  {op:9s} {name}: {line}", flush=True)

# And the named hot ops from the trace, verbatim
print("\nTrace-named ops:")
for pat in ["copy.611", "copy.607", "copy.614", "copy.589", "reshape.300",
            "reshape.303", "reshape.403", "reshape.404", "fusion.415",
            "broadcast_select_fusion"]:
    for line in txt.splitlines():
        if re.search(rf"%?{re.escape(pat)}\b\s*=", line):
            print(f"  {line.strip()[:240]}", flush=True)
            break
print("HLO_PROBE done", flush=True)
