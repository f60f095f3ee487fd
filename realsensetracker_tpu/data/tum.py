"""TUM RGB-D dataset loader (fr1/desk is the BASELINE parity dataset).

Replaces the reference's camera/protobuf ingestion (rs_driver.cpp,
rs_replay_app.cpp:219-225) for offline evaluation. TUM format: per-sequence
directory with depth/ (16-bit PNG, meters = value / 5000), rgb/, and
timestamped index files depth.txt / rgb.txt / groundtruth.txt.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

DEPTH_SCALE = 5000.0  # TUM convention: png_value / 5000 = meters


def _read_index(path: str) -> list[tuple[float, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def _read_groundtruth(path: str) -> list[tuple[float, np.ndarray]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            out.append((v[0], np.asarray(v[1:8])))  # tx ty tz qx qy qz qw
    return out


@dataclass
class TumSequence:
    """Lazy TUM sequence: depth frames decoded on demand."""

    root: str
    depth_index: list
    rgb_index: list
    groundtruth: list

    @staticmethod
    def open(root: str) -> "TumSequence":
        depth = _read_index(os.path.join(root, "depth.txt"))
        rgb_path = os.path.join(root, "rgb.txt")
        rgb = _read_index(rgb_path) if os.path.exists(rgb_path) else []
        gt_path = os.path.join(root, "groundtruth.txt")
        gt = _read_groundtruth(gt_path) if os.path.exists(gt_path) else []
        return TumSequence(root=root, depth_index=depth, rgb_index=rgb, groundtruth=gt)

    def __len__(self) -> int:
        return len(self.depth_index)

    def timestamp(self, i: int) -> float:
        return self.depth_index[i][0]

    def depth(self, i: int) -> np.ndarray:
        """Depth frame i as float32 meters (0 = invalid)."""
        ts, rel = self.depth_index[i]
        del ts
        return load_depth_png(os.path.join(self.root, rel))

    def frames(self, start: int = 0, stop: int | None = None):
        stop = len(self) if stop is None else min(stop, len(self))
        for i in range(start, stop):
            yield self.timestamp(i), self.depth(i)

    def groundtruth_trajectory(self):
        from realsensetracker_tpu.tracking.trajectory import Trajectory
        from realsensetracker_tpu.geometry import se3
        import jax.numpy as jnp

        traj = Trajectory()
        for ts, v in self.groundtruth:
            T = np.eye(4)
            T[:3, :3] = np.asarray(
                se3.matrix_from_quaternion(jnp.asarray(v[3:7], jnp.float32))
            )
            T[:3, 3] = v[:3]
            traj.append(ts, T)
        return traj


def load_depth_png(path: str) -> np.ndarray:
    """16-bit depth PNG -> float32 meters. Uses the native C++ decoder when
    built (realsensetracker_tpu.native), else PIL."""
    try:
        from realsensetracker_tpu.native import png_io

        raw = png_io.read_png16(path)
    except Exception:
        from PIL import Image

        raw = np.asarray(Image.open(path), dtype=np.uint16)
    return raw.astype(np.float32) / DEPTH_SCALE


def synthesize_tum_sequence(root: str, num_frames: int = 10, seed: int = 0,
                            width: int = 640, height: int = 480) -> str:
    """Write a small synthetic TUM-format sequence (tests / offline demos).

    Renders the raycast scene along a random-walk trajectory and saves
     16-bit depth PNGs + depth.txt + groundtruth.txt.
    """
    import jax.numpy as jnp
    from PIL import Image

    from realsensetracker_tpu.data import synthetic
    from realsensetracker_tpu.geometry import camera, se3

    intr = camera.Intrinsics(
        fx=width * 0.8, fy=width * 0.8, cx=(width - 1) / 2, cy=(height - 1) / 2,
        width=width, height=height,
    )
    depths, poses = synthetic.render_trajectory(intr, num_frames, seed=seed)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    index_lines, gt_lines = [], []
    for i in range(num_frames):
        ts = i / 30.0
        d16 = np.clip(np.asarray(depths[i]) * DEPTH_SCALE, 0, 65535).astype(np.uint16)
        rel = f"depth/{ts:.6f}.png"
        Image.fromarray(d16).save(os.path.join(root, rel))
        index_lines.append(f"{ts:.6f} {rel}")
        T = np.asarray(poses[i])
        q = np.asarray(se3.quaternion_from_matrix(jnp.asarray(T[:3, :3])))
        t = T[:3, 3]
        gt_lines.append(
            f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}"
        )
    with open(os.path.join(root, "depth.txt"), "w") as f:
        f.write("\n".join(index_lines) + "\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("\n".join(gt_lines) + "\n")
    return root
