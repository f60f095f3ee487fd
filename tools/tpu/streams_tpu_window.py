"""On-TPU windowed multi-stream FPS (CLAUDE.md pending item): rs_streams
per-frame vs --window 4 at 640x480, 8 streams, depth and RGB-D modes,
all in ONE process (gotcha 11: cross-process absolute timings are
meaningless through the relay). The CLI itself is memoization-proof
(distinct synthetic frames per step, poses materialized as the fence).

Run from /root/repo:  python - < tools/tpu/streams_tpu_window.py
"""
import contextlib
import io
import re
import json
import sys

sys.path.insert(0, "/root/repo")
from realsensetracker_tpu.cli import rs_streams

BASE = ["--streams", "8", "--frames", "33", "--width", "640",
        "--height", "480"]


def run(extra, tag):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = rs_streams.main(BASE + extra)
    out = buf.getvalue()
    m = re.search(r"([\d.]+) FPS/stream \((\d+) frames/s aggregate\)", out)
    if rc != 0 or not m:
        print(f"== {tag}: FAILED rc={rc}; output follows\n{out}", flush=True)
        sys.exit(1)
    fps = float(m.group(1))
    print(f"== {tag}: {fps:.1f} FPS/stream, {m.group(2)} frames/s aggregate",
          flush=True)
    return fps


if __name__ == "__main__":
    import jax
    print("devices:", jax.devices(), flush=True)
    res = {}
    res["depth_per_frame_fps"] = run([], "depth per-frame")
    res["depth_window4_fps"] = run(["--window", "4"], "depth window=4")
    res["rgbd_per_frame_fps"] = run(["--rgb"], "rgbd per-frame")
    res["rgbd_window4_fps"] = run(["--rgb", "--window", "4"],
                                  "rgbd window=4")
    print("STREAMS_TPU_WINDOW", json.dumps(res), flush=True)
