"""On-TPU windowed-SLAM measurement (CLAUDE.md pending item): rs_replay
--method slam per-frame vs --window 4 on the SAME 120-frame 640x480
out-and-back sequence, BOTH in ONE process (gotcha 11: cross-process
absolute timings are meaningless through the relay).

Run from /root/repo (stdin form keeps cwd on sys.path, gotcha 9):
  nohup python - < tools/tpu/slam_tpu_window.py > LOG 2>&1 &
"""
import contextlib
import io
import json
import statistics
import sys

sys.path.insert(0, "/root/repo")
from realsensetracker_tpu.cli import rs_replay

DATA = "/root/repo/.data/synth640"


def run(extra, tag):
    buf = io.StringIO()
    argv = ["--tum", DATA, "--method", "slam", "--json", "--ate",
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
        print(f"== {tag}: FAILED rc={rc}, {len(ms)} frame records; "
              f"output follows\n{out}", flush=True)
        sys.exit(1)
    steady = sorted(ms[10:]) if len(ms) > 20 else sorted(ms)
    med = statistics.median(steady)
    p90 = steady[int(0.9 * len(steady))]
    print(f"== {tag}: rc={rc} frames={len(ms)} median={med:.1f} ms "
          f"p90={p90:.1f} ms ate={ate}", flush=True)
    return med, p90, ate


if __name__ == "__main__":
    import jax
    print("devices:", jax.devices(), flush=True)
    m1, p1, a1 = run([], "slam per-frame")
    m4, p4, a4 = run(["--window", "4"], "slam window=4")
    m8, p8, a8 = run(["--window", "8"], "slam window=8")
    print(json.dumps({
        "per_frame": {"median_ms": m1, "p90_ms": p1, "ate": a1},
        "window4": {"median_ms": m4, "p90_ms": p4, "ate": a4},
        "window8": {"median_ms": m8, "p90_ms": p8, "ate": a8},
    }), flush=True)
