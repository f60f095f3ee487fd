"""rs-streams: concurrent multi-stream tracking demo (BASELINE config 5).

Tracks S independent depth streams in one compiled step per frame-tick
(parallel/streams.py) and reports aggregate and per-stream FPS -- the
"8 concurrent streams at 30 FPS each with live pose output" configuration.

Usage:
  python -m realsensetracker_tpu.cli.rs_streams --streams 8 --frames 30
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rs-streams", description=__doc__)
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--window", type=int, default=0,
                   help="scan W frames per dispatch (S x W frames advance "
                        "in ONE compiled step; 0 = one dispatch per frame)")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--rgb", action="store_true",
                   help="RGB-D streams: joint point-to-plane + photometric "
                        "odometry per stream (parallel/streams "
                        "step_streams_masked_rgbd[_window])")
    p.add_argument("--print-poses", action="store_true")
    return p


def _run_rgbd(args, intr) -> int:
    """RGB-D multi-stream loop (stats-row based; see MASKED_RGBD layout)."""
    import jax.numpy as jnp

    from realsensetracker_tpu.data import synthetic
    from realsensetracker_tpu.parallel import streams

    s = args.streams
    print(f"rendering {s} x {args.frames} synthetic RGB-D frames ...")
    all_d, all_g = [], []
    for i in range(s):
        scene = synthetic.default_scene(seed=40 + i)
        d, c, _ = synthetic.render_trajectory_rgbd(
            intr, args.frames, scene=scene, seed=i, step_scale=0.01
        )
        all_d.append(d)
        all_g.append(synthetic.intensity_from_rgb(c))
    depths = jnp.stack(all_d, axis=1)  # (F, S, H, W)
    grays = jnp.stack(all_g, axis=1)

    ones = jnp.ones((s,), bool)
    zeros = jnp.zeros((s,), bool)
    state = streams.blank_streams_rgbd(intr, num_streams=s)
    # Seeding on frame 0 doubles as the single-step compile + warmup
    # (distinct from every timed frame, so the relay memoizer cannot skip).
    state, _ = streams.step_streams_masked_rgbd(
        state, depths[0], grays[0], ones, ones, intr
    )
    np.asarray(state.poses)  # warmup fence

    win = max(0, args.window)
    usable = ((args.frames - 1) // win) * win if win else 0
    if win:
        aw = jnp.ones((s, win), bool)
        sw = jnp.zeros((s, win), bool)
        warm_d = jnp.repeat(depths[0][:, None], win, axis=1)
        warm_g = jnp.repeat(grays[0][:, None], win, axis=1)
        st_w, _ = streams.step_streams_masked_rgbd_window(
            state, warm_d, warm_g, aw, sw, intr
        )
        np.asarray(st_w.poses)  # window-program warmup fence (discarded)

    t0 = time.perf_counter()
    n_steps = 0
    stats_log = []  # per-frame (S, 36) rows
    if win:
        for k in range(0, usable, win):
            state, st = streams.step_streams_masked_rgbd_window(
                state,
                jnp.moveaxis(depths[1 + k : 1 + k + win], 0, 1),
                jnp.moveaxis(grays[1 + k : 1 + k + win], 0, 1),
                aw, sw, intr,
            )
            stats_log.extend(st[:, j] for j in range(win))
            n_steps += win
        tail = range(1 + usable, args.frames)
    else:
        tail = range(1, args.frames)
    for f in tail:
        state, st = streams.step_streams_masked_rgbd(
            state, depths[f], grays[f], ones, zeros, intr
        )
        stats_log.append(st)
        n_steps += 1
    np.asarray(state.poses)  # timing fence (host materialization)
    dt = time.perf_counter() - t0
    for f, st in enumerate(stats_log, start=1):
        st = np.asarray(st)
        ok = int((st[:, 32] > 0.5).sum())
        if args.print_poses:
            for i in range(s):
                t = st[i, :16].reshape(4, 4)[:3, 3]
                print(f"  frame {f} stream {i}: "
                      f"t=({t[0]:+.3f},{t[1]:+.3f},{t[2]:+.3f})")
        else:
            print(f"frame {f}: {ok}/{s} streams tracking")
    per_stream_fps = n_steps / dt
    print(
        f"{s} RGB-D streams x {n_steps} steps in {dt:.2f}s: "
        f"{per_stream_fps:.1f} FPS/stream "
        f"({s * per_stream_fps:.0f} frames/s aggregate)"
    )
    target = 30.0
    print(f"config-5 target 30 FPS/stream: "
          f"{'MET' if per_stream_fps >= target else 'NOT MET'}")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp

    from realsensetracker_tpu.data import synthetic
    from realsensetracker_tpu.geometry import camera
    from realsensetracker_tpu.parallel import streams

    intr = camera.Intrinsics(
        fx=args.width * 0.8, fy=args.width * 0.8,
        cx=(args.width - 1) / 2, cy=(args.height - 1) / 2,
        width=args.width, height=args.height,
    )
    if args.rgb:
        return _run_rgbd(args, intr)
    s = args.streams
    print(f"rendering {s} x {args.frames} synthetic frames ...")
    all_depths = []
    for i in range(s):
        scene = synthetic.default_scene(seed=40 + i)
        d, _ = synthetic.render_trajectory(intr, args.frames, scene=scene,
                                           seed=i, step_scale=0.01)
        all_depths.append(d)
    depths = jnp.stack(all_depths, axis=1)  # (F, S, H, W)

    state = streams.init_streams(depths[0], intr)
    win = max(0, args.window)
    if win:
        # (F, S, H, W) -> full windows of W frames: (n_win, S, W, H, Wd).
        # The trailing (frames-1) % W steps fall back to per-frame stepping
        # below -- silently dropping them would misreport the run (and a
        # short tail window would cost its own 30-90 s relay compile).
        usable = ((args.frames - 1) // win) * win
        windows = [
            jnp.moveaxis(depths[1 + k : 1 + k + win], 0, 1)
            for k in range(0, usable, win)
        ]
        tail = list(range(1 + usable, args.frames))
        # Warm up on a DISTINCT input (frame 0 vs itself): repeating the
        # first timed window here would let the relay memoize it.
        warm = jnp.repeat(depths[0][:, None], win, axis=1)
        state_w, _ = streams.step_streams_window(state, warm, intr)
        np.asarray(state_w.poses)  # warmup fence (compile + execute)
    else:
        # Warm up / compile one step (frame 0 vs itself -- distinct from
        # every timed step, so the relay memoizer cannot skip step 1).
        state_w, _ = streams.step_streams(state, depths[0], intr)
        np.asarray(state_w.poses)  # warmup fence (compile + execute)

    # Per-frame host readbacks are expensive through remote-dispatch
    # runtimes: keep results on device during the timed loop and read the
    # log afterwards ("live pose output" = device-resident poses each tick).
    t0 = time.perf_counter()
    n_steps = 0
    results = []
    if win:
        for wnd in windows:
            state, res = streams.step_streams_window(state, wnd, intr)
            # Unstack (S, W, ...) window results into per-frame records.
            results.extend(
                streams.StreamStepResult(*(x[:, j] for x in res))
                for j in range(win)
            )
            n_steps += win
        for f in tail:  # per-frame for the partial last window
            state, res = streams.step_streams(state, depths[f], intr)
            results.append(res)
            n_steps += 1
    else:
        for f in range(1, args.frames):
            state, res = streams.step_streams(state, depths[f], intr)
            results.append(res)
            n_steps += 1
    # Host materialization is the timing fence: block_until_ready is NOT
    # reliable through the axon relay (BENCHMARKS.md "Measurement
    # methodology").
    np.asarray(state.poses)
    dt = time.perf_counter() - t0
    for f, res in enumerate(results, start=1):
        ok = int(np.asarray(res.success).sum())
        if args.print_poses:
            for i in range(s):
                t = np.asarray(res.poses[i][:3, 3])
                print(f"  frame {f} stream {i}: t=({t[0]:+.3f},{t[1]:+.3f},{t[2]:+.3f})")
        else:
            print(f"frame {f}: {ok}/{s} streams tracking")
    per_stream_fps = n_steps / dt
    print(
        f"{s} streams x {n_steps} steps in {dt:.2f}s: "
        f"{per_stream_fps:.1f} FPS/stream ({s * per_stream_fps:.0f} frames/s aggregate)"
    )
    target = 30.0
    print(f"config-5 target 30 FPS/stream: {'MET' if per_stream_fps >= target else 'NOT MET'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
