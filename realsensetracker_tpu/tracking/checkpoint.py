"""Tracker state checkpoint/resume.

The reference never persists program state (SURVEY.md section 5.4): the
accumulated pose and world model die with the process. Here tracker state
-- pose, frame index, trajectory, world model, reference pyramid -- saves
to a single .npz and restores into a live tracker, so long streams survive
restarts and multi-host jobs can migrate streams.
"""

from __future__ import annotations

import numpy as np

from realsensetracker_tpu.tracking.trajectory import Trajectory

FORMAT_VERSION = 3  # v2: packed = (4,H,W) plane table; v3: flagship
# keyframe pyramids have 4 levels (config-dependent level COUNT is stored,
# but v2-era defaults produced 3-level pyramids that a 4-level tracker
# cannot resume against)


def _flatten_levels(levels) -> dict:
    out = {}
    if levels is None:
        return out
    for i, lv in enumerate(levels):
        out[f"level{i}_vertex"] = np.asarray(lv.vertex_map)
        out[f"level{i}_normal"] = np.asarray(lv.normal_map)
        out[f"level{i}_valid"] = np.asarray(lv.valid)
        out[f"level{i}_vertex_valid"] = np.asarray(lv.vertex_valid)
        out[f"level{i}_packed"] = np.asarray(lv.packed)
    out["num_levels"] = np.int64(len(levels))
    return out


def _restore_levels(data) -> list | None:
    from realsensetracker_tpu.ops.pyramid import PyramidLevel
    import jax.numpy as jnp

    if "num_levels" not in data:
        return None
    n = int(data["num_levels"])
    return [
        PyramidLevel(
            vertex_map=jnp.asarray(data[f"level{i}_vertex"]),
            normal_map=jnp.asarray(data[f"level{i}_normal"]),
            valid=jnp.asarray(data[f"level{i}_valid"]),
            vertex_valid=jnp.asarray(data[f"level{i}_vertex_valid"]),
            packed=jnp.asarray(data[f"level{i}_packed"]),
        )
        for i in range(n)
    ]


def save_tracker(path: str, tracker) -> None:
    """Snapshot a FrameToFrameTracker (or compatible) to `path` (.npz)."""
    payload = {
        "format_version": np.int64(FORMAT_VERSION),
        "frame_index": np.int64(tracker._index),
        "traj_timestamps": np.asarray(tracker.trajectory.timestamps, np.float64),
        "traj_poses": np.stack(tracker.trajectory.poses)
        if tracker.trajectory.poses
        else np.zeros((0, 4, 4)),
    }
    if tracker._pose is not None:
        payload["pose"] = np.asarray(tracker._pose)
    payload.update(_flatten_levels(tracker._prev_levels))
    if getattr(tracker, "_map", None) is not None:
        payload["map_points"] = np.asarray(tracker._map.points)
        payload["map_keys"] = np.asarray(tracker._map.keys)
        payload["map_mask"] = np.asarray(tracker._map.mask)
    np.savez_compressed(path, **payload)


def load_tracker(path: str, tracker) -> None:
    """Restore a snapshot produced by save_tracker into `tracker` in place."""
    import jax.numpy as jnp

    from realsensetracker_tpu.tracking.accumulator import MapAccumulator

    data = np.load(path, allow_pickle=False)
    version = int(data["format_version"])
    if version != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {version} != {FORMAT_VERSION}")
    tracker._index = int(data["frame_index"])
    traj = Trajectory()
    for ts, T in zip(data["traj_timestamps"], data["traj_poses"]):
        traj.append(float(ts), T)
    tracker.trajectory = traj
    tracker._pose = jnp.asarray(data["pose"]) if "pose" in data else None
    # Host mirror kept by the streaming trackers (the per-frame path reads
    # poses from the fused step's packed stats, never from the device copy).
    tracker._pose_np = (
        np.asarray(data["pose"], np.float32) if "pose" in data else None
    )
    levels = _restore_levels(data)
    tracker._prev_levels = tuple(levels) if levels is not None else None
    if tracker._prev_levels is not None:
        # Rebuild the intrinsics pyramid from the tracker's base intrinsics
        # (same iterated halving as ops.pyramid.build_pyramid).
        intrs = []
        cur = tracker.intr
        for _ in range(len(tracker._prev_levels)):
            intrs.append(cur)
            cur = cur.scaled(0.5)
        tracker._intrs = tuple(intrs)
    if "map_points" in data:
        tracker._map = MapAccumulator(
            points=jnp.asarray(data["map_points"]),
            keys=jnp.asarray(data["map_keys"]),
            mask=jnp.asarray(data["map_mask"]),
        )
