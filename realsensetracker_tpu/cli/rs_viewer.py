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
    p.add_argument("--color", action="store_true",
                   help="Record RGB-D (v2 clip with a color plane)")
    p.add_argument("--view", default="", help="View an existing .rsc clip")
    p.add_argument("--render-dir", default="", help="Write depth PNGs here")
    p.add_argument("--ply-dir", default="",
                   help="Export per-frame (colored) PLY clouds here")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from realsensetracker_tpu.data import recorded

    if args.record:
        clip = recorded.record_synthetic_clip(
            args.record, num_frames=args.frames, seed=args.seed,
            width=args.width, height=args.height, with_color=args.color,
        )
        tag = "RGB-D" if clip.has_color else "depth"
        print(f"recorded {len(clip)} {tag} frames -> {args.record}")
    if args.view:
        clip = recorded.read_clip(args.view)
        tag = "RGB-D" if clip.has_color else "depth"
        print(f"{args.view}: {len(clip)} {tag} frames {clip.depths.shape[1:]} "
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
        if args.ply_dir:
            # Colored-cloud export: the reference viewer's colored rendering
            # (rs_viewer.cpp:90-100) as per-frame PLY files.
            import numpy as np

            from realsensetracker_tpu.geometry import camera as camera_mod
            from realsensetracker_tpu.vis import export_ply

            os.makedirs(args.ply_dir, exist_ok=True)
            import jax.numpy as jnp

            for i in range(len(clip)):
                d = jnp.asarray(clip.depths[i])
                verts = np.asarray(camera_mod.unproject_depth(d, clip.intrinsics))
                ok = np.asarray(clip.depths[i] > 0).reshape(-1)
                pts = verts.reshape(-1, 3)[ok]
                cols = None
                if clip.has_color:
                    cols = clip.colors[i].reshape(-1, 3)[ok].astype(np.float32) / 255.0
                export_ply(os.path.join(args.ply_dir, f"cloud_{i:04d}.ply"),
                           pts, cols)
            print(f"exported {len(clip)} PLY clouds -> {args.ply_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
