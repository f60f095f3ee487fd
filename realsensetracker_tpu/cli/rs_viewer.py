"""rs-viewer: capture/record/view frames (headless).

Port of rs_viewer_app (rs_viewer_app.cpp:26-58) + the viewer loop's record
path (rs_viewer.cpp:105-112): with no camera hardware in a TPU pod, the
capture source is the synthetic raycast scene or an existing clip; frames
can be recorded to .rsc and/or rendered to PNGs.

Usage:
  python -m realsensetracker_tpu.cli.rs_viewer --record /tmp/clip.rsc --frames 60
  python -m realsensetracker_tpu.cli.rs_viewer --view clip.rsc --render-dir /tmp/out
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rs-viewer", description=__doc__)
    p.add_argument("--record", "-r", default="",
                   help="Record synthetic capture to this .rsc file")
    p.add_argument("--frame-interval", "-f", type=float, default=0.0,
                   help="Frame interval in ms (ref default 1000)")
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--view", default="", help="View an existing .rsc clip")
    p.add_argument("--render-dir", default="", help="Write depth PNGs here")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from realsensetracker_tpu.data import recorded

    if args.record:
        clip = recorded.record_synthetic_clip(
            args.record, num_frames=args.frames, seed=args.seed,
            width=args.width, height=args.height,
        )
        print(f"recorded {len(clip)} frames -> {args.record}")
    if args.view:
        clip = recorded.read_clip(args.view)
        print(f"{args.view}: {len(clip)} frames {clip.depths.shape[1:]} "
              f"intr=({clip.intrinsics.fx:.1f},{clip.intrinsics.fy:.1f},"
              f"{clip.intrinsics.cx:.1f},{clip.intrinsics.cy:.1f})")
        if args.render_dir:
            from realsensetracker_tpu.vis import render_depth_png

            os.makedirs(args.render_dir, exist_ok=True)
            for i in range(len(clip)):
                render_depth_png(
                    os.path.join(args.render_dir, f"depth_{i:04d}.png"),
                    clip.depths[i],
                )
            print(f"rendered {len(clip)} PNGs -> {args.render_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
