"""On-chip rs_replay SLAM windows AFTER SlamConfig.window_defer_events
(promotions consumed in-scan; truncation only at recovery re-seeds).
Compare against replay_tpu_u16.py's truncating wave numbers on the same
sequence. ONE VARIANT PER PROCESS (pf | w4 | w8 as argv[1]): gotcha 12 --
upload-heavy dispatch cost grows with process age, so each variant must
own a fresh process.

Run from /root/repo, serialized:
  for v in pf w4 w8; do python - $v < tools/tpu/slam_defer_tpu.py; done
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
    ms, kfs, ate = [], [], None
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "ms" in rec:
                ms.append(rec["ms"])
                kfs.append(bool(rec.get("kf", False)))
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
    # Spike profile: which frames carry the tail, and their offset from
    # the nearest PRECEDING keyframe event (pipeline stages land on
    # event+1..event+3 frames).
    ev = [i for i, k in enumerate(kfs) if k]

    def off(i):
        prev = [e for e in ev if e <= i]
        return i - prev[-1] if prev else -1

    spikes = sorted(enumerate(ms), key=lambda kv: -kv[1])[:15]
    print("top frames (idx, ms, evt_offset):",
          [(i, round(v, 1), off(i)) for i, v in sorted(spikes)],
          flush=True)
    print(f"events at: {ev}", flush=True)
    print(f"== {tag}: frames={n} median={med:.1f} ms p90={p90:.1f} ms "
          f"agg={n / (wall / 1e3):.1f} fps ate={ate}", flush=True)
    return {"median_ms": round(med, 2), "p90_ms": round(p90, 2),
            "fps": round(n / (wall / 1e3), 1), "ate": ate}


def _instrument_stages():
    """Monkeypatch per-stage wall timers onto SlamTracker (variant
    'pfstage'): which pipeline stage carries the ~130 ms p90 frames?"""
    import time as _t

    from realsensetracker_tpu.tracking import slam as slam_mod

    acc = {}
    for name in ("_defer_keyframe", "_pending_fire_features",
                 "_pending_stage2", "_pending_stage3",
                 "_optimize_online"):
        orig = getattr(slam_mod.SlamTracker, name)

        def wrap(orig=orig, name=name):
            def f(self, *a, **kw):
                t0 = _t.perf_counter()
                out = orig(self, *a, **kw)
                acc.setdefault(name, []).append(
                    (_t.perf_counter() - t0) * 1e3)
                return out
            return f

        setattr(slam_mod.SlamTracker, name, wrap())
    return acc


if __name__ == "__main__":
    import jax
    print("devices:", jax.devices(), flush=True)
    variant = sys.argv[1] if len(sys.argv) > 1 else "pf"
    acc = _instrument_stages() if variant == "pfstage" else None
    extra = {"pf": [], "pfstage": [], "pfs2": ["--slam-prep-scale", "2"],
             "w4": ["--window", "4"], "w8": ["--window", "8"]}
    res = run("slam", extra[variant],
              f"slam {variant} (u16, deferred events)")
    if acc is not None:
        for name, ts in sorted(acc.items()):
            arr = sorted(ts)
            print(f"stage {name}: n={len(arr)} "
                  f"median={arr[len(arr) // 2]:.1f} max={arr[-1]:.1f} "
                  f"all={[round(v, 1) for v in arr[-8:]]}", flush=True)
    print("SLAM_DEFER_" + variant.upper(), json.dumps(res), flush=True)
