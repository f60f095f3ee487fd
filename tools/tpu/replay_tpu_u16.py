"""End-to-end rs_replay on the chip AFTER the windowed-paradox fixes
(raw u16 TUM streaming + multi-event keyframe windows): per-frame vs
windowed for method=keyframe and method=slam, one process, same
120-frame 640x480 sequence as slam_tpu_window.py (whose round-4 wave-1
numbers predate the fixes: slam pf 42.1 / win4 150.4 ms).

Run from /root/repo:  nohup python - < tools/tpu/replay_tpu_u16.py > LOG 2>&1 &
"""
import contextlib
import io
import json
import statistics
import sys

sys.path.insert(0, "/root/repo")
from realsensetracker_tpu.cli import rs_replay

DATA = "/root/repo/.data/synth640"


def run(method, extra, tag):
    buf = io.StringIO()
    argv = ["--tum", DATA, "--method", method, "--json", "--ate",
            "--frame-interval", "0"] + extra
    with contextlib.redirect_stdout(buf):
        rc = rs_replay.main(argv)
    out = buf.getvalue()
    ms, ate = [], None
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "ms" in rec:
                ms.append(rec["ms"])
        elif line.startswith("ATE:"):
            ate = json.loads(line[4:])
    if rc != 0 or not ms:
        print(f"== {tag}: FAILED rc={rc}, {len(ms)} records; output:\n{out}",
              flush=True)
        sys.exit(1)
    steady = sorted(ms[10:]) if len(ms) > 20 else sorted(ms)
    med = statistics.median(steady)
    p90 = steady[int(0.9 * len(steady))]
    n = len(ms)
    wall = sum(ms)
    print(f"== {tag}: frames={n} median={med:.1f} ms p90={p90:.1f} ms "
          f"agg={n / (wall / 1e3):.1f} fps ate={ate}", flush=True)
    return {"median_ms": round(med, 2), "p90_ms": round(p90, 2),
            "fps": round(n / (wall / 1e3), 1), "ate": ate}


if __name__ == "__main__":
    import jax
    print("devices:", jax.devices(), flush=True)
    res = {}
    res["kf_pf"] = run("keyframe", [], "keyframe per-frame (u16)")
    res["kf_w4"] = run("keyframe", ["--window", "4"],
                       "keyframe window=4 (u16, multi-event)")
    res["kf_w8"] = run("keyframe", ["--window", "8"],
                       "keyframe window=8 (u16, multi-event)")
    res["slam_pf"] = run("slam", [], "slam per-frame (u16)")
    res["slam_w4"] = run("slam", ["--window", "4"], "slam window=4 (u16)")
    res["slam_w8"] = run("slam", ["--window", "8"], "slam window=8 (u16)")
    print("REPLAY_U16", json.dumps(res), flush=True)
