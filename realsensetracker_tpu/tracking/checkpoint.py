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

FORMAT_VERSION = 4  # v2: packed = (4,H,W) plane table; v3: flagship
# keyframe pyramids have 4 levels (config-dependent level COUNT is stored,
# but v2-era defaults produced 3-level pyramids that a 4-level tracker
# cannot resume against); v4: resolution-aware schedule (projective.
# fit_levels) -- at sub-VGA resolutions default-config pyramids now carry
# fewer levels than a v3 tracker saved (640x480 checkpoints unaffected)


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


def _check_format_version(data, tracker) -> None:
    """Accept the current version, plus v3 snapshots that are actually
    bit-compatible. v3 -> v4 changed only the resolution-FITTED level
    count (projective.fit_levels, a no-op at >= VGA): a v3 checkpoint
    whose stored pyramid matches this tracker's fitted schedule resumes
    identically, so refusing it (e.g. every existing 640x480 snapshot)
    would be a gratuitous break. Snapshots with no stored pyramid are
    version-independent."""
    version = int(data["format_version"])
    if version == FORMAT_VERSION:
        return
    if version == 3 and "num_levels" in data:
        from realsensetracker_tpu.align.projective import fit_levels

        cfg = getattr(tracker, "cfg", None)
        intr = getattr(tracker, "intr", None)
        if cfg is not None and intr is not None:
            want = len(fit_levels(cfg, intr.height, intr.width).iters)
            if int(data["num_levels"]) == want:
                return
            raise ValueError(
                f"v3 checkpoint stores {int(data['num_levels'])} pyramid "
                f"levels but this tracker's resolution-fitted schedule "
                f"builds {want} (v4, projective.fit_levels); re-record "
                "the snapshot"
            )
    elif version == 3:
        return  # no pyramid stored: nothing v4 changed
    raise ValueError(f"checkpoint version {version} != {FORMAT_VERSION}")


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
    _check_format_version(data, tracker)
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
    if "map_points" in data:
        tracker._map = MapAccumulator(
            points=jnp.asarray(data["map_points"]),
            keys=jnp.asarray(data["map_keys"]),
            mask=jnp.asarray(data["map_mask"]),
        )
    elif getattr(tracker, "map_capacity", 0) and tracker._prev_levels is not None:
        # The tracker wants a world model but the snapshot has none (saved
        # from a map-disabled tracker). process() skips its map-init branch
        # once _prev_levels is restored, so the first successful frame
        # would hit _map=None inside tracing -- fail loudly instead.
        raise ValueError(
            "checkpoint has no world model but the tracker was built with "
            f"map_capacity={tracker.map_capacity}; restore into a tracker "
            "with map_capacity=0 or re-record the snapshot with its map"
        )


SLAM_FORMAT_VERSION = 1


def save_slam(path: str, tracker) -> None:
    """Snapshot a SlamTracker: VO state, keyframe store (poses, clouds,
    FPFH features, odometry measurements + confidences), loop edges, and
    counters, so a long SLAM stream survives restarts and can migrate
    hosts. The reference never persists program state (SURVEY.md section
    5.4); this is the mapping-pipeline extension of save_tracker."""
    # A deferred-booking pipeline in flight would otherwise vanish from
    # the snapshot (tracking/slam.py flush_pending).
    if hasattr(tracker, "flush_pending"):
        tracker.flush_pending()
    vo = tracker._vo
    payload = {
        "slam_version": np.int64(SLAM_FORMAT_VERSION),
        "format_version": np.int64(FORMAT_VERSION),
        "frame_index": np.int64(vo._index),
        "fail_streak": np.int64(vo._fail_streak),
        "fails_since_kf": np.int64(vo._fails_since_kf),
        "last_span_failures": np.int64(vo.last_span_failures),
        "frame_count": np.int64(tracker._frame_count),
        "lost": np.bool_(tracker.lost),
        "num_loop_closures": np.int64(tracker.num_loop_closures),
        "num_relocalizations": np.int64(tracker.num_relocalizations),
        "num_online_optimizations": np.int64(tracker.num_online_optimizations),
        "traj_timestamps": np.asarray(vo.trajectory.timestamps, np.float64),
        "traj_poses": np.stack(vo.trajectory.poses)
        if vo.trajectory.poses
        else np.zeros((0, 4, 4)),
    }
    if vo._pose is not None:
        payload["pose"] = np.asarray(vo._pose)
        payload["kf_pose"] = np.asarray(vo._kf_pose)
    if hasattr(vo, "_kf_target"):  # RGB-D VO (tracking/keyframe_rgbd.py)
        payload["slam_rgb"] = np.bool_(True)
        if vo._kf_target is not None:
            levels, grays = vo._kf_target
            payload.update(_flatten_levels(levels))
            for i, g in enumerate(grays):
                payload[f"level{i}_gray"] = np.asarray(g)
    else:
        payload.update(_flatten_levels(vo._kf_levels))
    kfs = tracker._keyframes
    if kfs:
        eye = np.eye(4, dtype=np.float32)
        payload["kf_frame_indices"] = np.asarray(
            [k.frame_index for k in kfs], np.int64
        )
        payload["kf_poses"] = np.stack([np.asarray(k.pose, np.float32) for k in kfs])
        payload["kf_cloud_points"] = np.stack(
            [np.asarray(k.cloud.points, np.float32) for k in kfs]
        )
        payload["kf_cloud_mask"] = np.stack([np.asarray(k.cloud.mask) for k in kfs])
        payload["kf_feats"] = np.stack(
            [np.asarray(k.feats, np.float32) for k in kfs]
        )
        payload["kf_odom"] = np.stack(
            [
                np.asarray(k.odom_from_prev, np.float32)
                if k.odom_from_prev is not None
                else eye
                for k in kfs
            ]
        )
        payload["kf_odom_w"] = np.asarray([k.odom_weight for k in kfs], np.float32)
    edges = tracker._loop_edges
    payload["loop_i"] = np.asarray([e[0] for e in edges], np.int64)
    payload["loop_j"] = np.asarray([e[1] for e in edges], np.int64)
    payload["loop_T"] = (
        np.stack([np.asarray(e[2], np.float32) for e in edges])
        if edges
        else np.zeros((0, 4, 4), np.float32)
    )
    payload["loop_w"] = np.asarray([e[3] for e in edges], np.float32)
    np.savez_compressed(path, **payload)


def load_slam(path: str, tracker) -> None:
    """Restore a save_slam snapshot into a freshly-constructed SlamTracker
    (same SlamConfig) in place. The keyframe database is rebuilt by
    re-adding every keyframe (descriptors are deterministic functions of
    the stored features), so place recognition and loop closure continue
    seamlessly."""
    import jax.numpy as jnp

    from realsensetracker_tpu.ops import cloud as cloud_mod
    from realsensetracker_tpu.tracking.slam import _Keyframe

    data = np.load(path, allow_pickle=False)
    sv = int(data["slam_version"])
    if sv != SLAM_FORMAT_VERSION:
        raise ValueError(f"slam checkpoint version {sv} != {SLAM_FORMAT_VERSION}")
    vo = tracker._vo
    _check_format_version(data, vo)
    vo._index = int(data["frame_index"])
    vo._fail_streak = int(data["fail_streak"])
    vo._fails_since_kf = int(data["fails_since_kf"])
    vo.last_span_failures = int(data["last_span_failures"])
    traj = Trajectory()
    for ts, T in zip(data["traj_timestamps"], data["traj_poses"]):
        traj.append(float(ts), T)
    vo.trajectory = traj
    vo._pose = jnp.asarray(data["pose"]) if "pose" in data else None
    vo._pose_np = (
        np.asarray(data["pose"], np.float32) if "pose" in data else None
    )
    vo._kf_pose = jnp.asarray(data["kf_pose"]) if "kf_pose" in data else None
    levels = _restore_levels(data)
    saved_rgb = "slam_rgb" in data and bool(data["slam_rgb"])
    if hasattr(vo, "_kf_target") != saved_rgb:
        raise ValueError(
            "SLAM checkpoint VO mismatch: snapshot "
            f"{'uses' if saved_rgb else 'does not use'} RGB-D odometry but "
            f"the tracker's SlamConfig.use_rgb disagrees"
        )
    if saved_rgb:
        if levels is not None:
            grays = tuple(
                jnp.asarray(data[f"level{i}_gray"]) for i in range(len(levels))
            )
            vo._kf_target = (tuple(levels), grays)
        else:
            vo._kf_target = None
        vo._last_target = vo._kf_target
    else:
        vo._kf_levels = tuple(levels) if levels is not None else None
        vo._last_levels = vo._kf_levels

    tracker._frame_count = int(data["frame_count"])
    tracker.lost = bool(data["lost"])
    tracker.num_loop_closures = int(data["num_loop_closures"])
    tracker.num_relocalizations = int(data["num_relocalizations"])
    tracker.num_online_optimizations = int(data["num_online_optimizations"])

    tracker._keyframes = []
    if "kf_poses" in data:
        for k in range(data["kf_poses"].shape[0]):
            cloud = cloud_mod.Cloud(
                points=jnp.asarray(data["kf_cloud_points"][k]),
                mask=jnp.asarray(data["kf_cloud_mask"][k]),
            )
            feats = jnp.asarray(data["kf_feats"][k])
            kf = _Keyframe(
                index=k,
                frame_index=int(data["kf_frame_indices"][k]),
                pose=np.asarray(data["kf_poses"][k], np.float32),
                cloud=cloud,
                feats=feats,
                odom_from_prev=(
                    np.asarray(data["kf_odom"][k], np.float32) if k else None
                ),
                odom_weight=float(data["kf_odom_w"][k]),
            )
            tracker._keyframes.append(kf)
            tracker._db.add(k, cloud, feats)
    tracker._loop_edges = [
        (int(i), int(j), np.asarray(T, np.float32), float(w))
        for i, j, T, w in zip(
            data["loop_i"], data["loop_j"], data["loop_T"], data["loop_w"]
        )
    ]


TSDF_FORMAT_VERSION = 1


def _unwrap_tsdf(tracker):
    """Accept either a TsdfTracker or the api.Tracker facade around one."""
    impl = getattr(tracker, "_impl", tracker)
    if not hasattr(impl, "_vol"):
        raise ValueError("not a TSDF tracker (method='tsdf')")
    return impl


def save_tsdf(path: str, tracker) -> None:
    """Snapshot a TsdfTracker: pose, trajectory, and the full dense volume
    (tsdf/weight [+ color planes]), so a long dense-mapping stream
    survives restarts. The grid is mostly-constant away from surfaces, so
    npz compression keeps snapshots far below the in-memory 16-57 MB."""
    tracker = _unwrap_tsdf(tracker)
    payload = {
        "tsdf_version": np.int64(TSDF_FORMAT_VERSION),
        "frame_index": np.int64(tracker._index),
        "traj_timestamps": np.asarray(
            tracker.trajectory.timestamps, np.float64
        ),
        "traj_poses": np.stack(tracker.trajectory.poses)
        if tracker.trajectory.poses
        else np.zeros((0, 4, 4)),
    }
    if tracker._pose is not None:
        payload["pose"] = np.asarray(tracker._pose)
    payload["vol_voxel_size"] = np.float64(tracker.volume.voxel_size)
    payload["vol_origin"] = np.asarray(tracker.volume.origin, np.float64)
    if tracker._vol is not None:
        payload["vol_tsdf"] = np.asarray(tracker._vol.tsdf)
        payload["vol_weight"] = np.asarray(tracker._vol.weight)
        if tracker._vol.color is not None:
            payload["vol_color"] = np.asarray(tracker._vol.color)
            payload["vol_color_weight"] = np.asarray(
                tracker._vol.color_weight
            )
    np.savez_compressed(path, **payload)


def load_tsdf(path: str, tracker) -> None:
    """Restore a save_tsdf snapshot into a freshly-constructed TsdfTracker
    (same TsdfConfig) in place."""
    import jax.numpy as jnp

    from realsensetracker_tpu.mapping.tsdf import TsdfVolume

    tracker = _unwrap_tsdf(tracker)
    data = np.load(path, allow_pickle=False)
    version = int(data["tsdf_version"])
    if version != TSDF_FORMAT_VERSION:
        raise ValueError(
            f"tsdf checkpoint version {version} != {TSDF_FORMAT_VERSION}"
        )
    saved_color = "vol_color" in data
    if "vol_voxel_size" in data:
        vs = float(data["vol_voxel_size"])
        org = data["vol_origin"]
        if (
            abs(vs - tracker.volume.voxel_size) > 1e-9
            or np.abs(org - np.asarray(tracker.volume.origin)).max() > 1e-9
        ):
            raise ValueError(
                f"snapshot volume geometry (voxel {vs} m, origin "
                f"{org.tolist()}) != configured (voxel "
                f"{tracker.volume.voxel_size} m, origin "
                f"{list(tracker.volume.origin)})"
            )
    if "vol_tsdf" in data:
        v = data["vol_tsdf"].shape[-1]
        if v != tracker.volume.resolution:
            raise ValueError(
                f"snapshot volume {v}^3 != configured "
                f"{tracker.volume.resolution}^3"
            )
        if saved_color != bool(tracker.use_color):
            raise ValueError(
                "TSDF checkpoint color mismatch: snapshot "
                f"{'has' if saved_color else 'lacks'} color planes but the "
                "tracker's use_color disagrees"
            )
        tracker._vol = TsdfVolume(
            tsdf=jnp.asarray(data["vol_tsdf"]),
            weight=jnp.asarray(data["vol_weight"]),
            color=jnp.asarray(data["vol_color"]) if saved_color else None,
            color_weight=(
                jnp.asarray(data["vol_color_weight"]) if saved_color
                else None
            ),
        )
    else:
        tracker._vol = None
    tracker._index = int(data["frame_index"])
    traj = Trajectory()
    for ts, T in zip(data["traj_timestamps"], data["traj_poses"]):
        traj.append(float(ts), T)
    tracker.trajectory = traj
    if "pose" in data:
        tracker._pose = jnp.asarray(data["pose"])
        tracker._pose_np = np.asarray(data["pose"], np.float32)
    else:
        tracker._pose = None
        tracker._pose_np = None


SUBMAP_FORMAT_VERSION = 1


def _unwrap_submaps(tracker):
    """Accept a SubmapTsdfTracker or the api.Tracker facade around one."""
    impl = getattr(tracker, "_impl", tracker)
    if not (hasattr(impl, "_subs") and hasattr(impl, "_t")):
        raise ValueError(
            "not a submap TSDF tracker (method='tsdf' with a spawn radius)"
        )
    return impl


def save_submaps(path: str, tracker) -> None:
    """Snapshot a SubmapTsdfTracker: every submap's anchor + dense planes
    (stacked (K, V, V, V); the active one's live volume included), the
    handover span log, the inner tracker pose, and the world trajectory.
    Same compressed-npz rationale as save_tsdf -- grids are
    mostly-constant away from surfaces."""
    tr = _unwrap_submaps(tracker)
    inner = tr._t
    cfg = tr.config
    subs = tr.submaps  # live anchor/volume substituted for the active id
    payload = {
        "submap_version": np.int64(SUBMAP_FORMAT_VERSION),
        "vol_voxel_size": np.float64(cfg.volume.voxel_size),
        "vol_origin": np.asarray(cfg.volume.origin, np.float64),
        "spawn_radius": np.float64(cfg.spawn_radius),
        "frame_index": np.int64(inner._index),
        "frames_in_active": np.int64(tr._frames_in_active),
        "active_id": np.int64(tr._active_id),
        "span_log": np.asarray(tr._span_log, np.int64).reshape(-1, 2),
        "traj_timestamps": np.asarray(tr.trajectory.timestamps, np.float64),
        "traj_poses": np.stack(tr.trajectory.poses)
        if tr.trajectory.poses else np.zeros((0, 4, 4)),
    }
    if subs:
        payload["anchors"] = np.stack(
            [s.world_from_submap for s in subs]
        ).astype(np.float32)
        # Stored frames EXCLUDE the active streak (frames_in_active is
        # its own field and is re-added on the next freeze).
        payload["sub_frames"] = np.asarray(
            [e.frames for e in tr._subs], np.int64
        )
        payload["subs_tsdf"] = np.stack(
            [np.asarray(s.volume.tsdf) for s in subs]
        )
        payload["subs_weight"] = np.stack(
            [np.asarray(s.volume.weight) for s in subs]
        )
        if tr.use_color:
            payload["subs_color"] = np.stack(
                [np.asarray(s.volume.color) for s in subs]
            )
            payload["subs_color_weight"] = np.stack(
                [np.asarray(s.volume.color_weight) for s in subs]
            )
    if inner._pose is not None:
        payload["pose"] = np.asarray(inner._pose)
    np.savez_compressed(path, **payload)


def load_submaps(path: str, tracker) -> None:
    """Restore a save_submaps snapshot into a freshly-constructed
    SubmapTsdfTracker (same SubmapConfig volume geometry) in place."""
    import jax
    import jax.numpy as jnp

    from realsensetracker_tpu.mapping.submaps import Submap
    from realsensetracker_tpu.mapping.tsdf import TsdfVolume

    tr = _unwrap_submaps(tracker)
    inner = tr._t
    data = np.load(path, allow_pickle=False)
    version = int(data["submap_version"])
    if version != SUBMAP_FORMAT_VERSION:
        raise ValueError(
            f"submap checkpoint version {version} != {SUBMAP_FORMAT_VERSION}"
        )
    vs = float(data["vol_voxel_size"])
    org = data["vol_origin"]
    cfgv = tr.config.volume
    if (abs(vs - cfgv.voxel_size) > 1e-9
            or np.abs(org - np.asarray(cfgv.origin)).max() > 1e-9):
        raise ValueError(
            f"snapshot volume geometry (voxel {vs} m, origin "
            f"{org.tolist()}) != configured (voxel {cfgv.voxel_size} m, "
            f"origin {list(cfgv.origin)})"
        )
    saved_color = "subs_color" in data
    if "anchors" in data and saved_color != bool(tr.use_color):
        raise ValueError(
            "submap checkpoint color mismatch: snapshot "
            f"{'has' if saved_color else 'lacks'} color planes but the "
            "tracker's use_color disagrees"
        )

    active_id = int(data["active_id"])
    tr._subs = []
    if "anchors" in data:
        if data["subs_tsdf"].shape[-1] != cfgv.resolution:
            raise ValueError(
                f"snapshot volume {data['subs_tsdf'].shape[-1]}^3 != "
                f"configured {cfgv.resolution}^3"
            )
        for i in range(data["anchors"].shape[0]):
            vol = TsdfVolume(
                tsdf=np.asarray(data["subs_tsdf"][i]),
                weight=np.asarray(data["subs_weight"][i]),
                color=np.asarray(data["subs_color"][i])
                if saved_color else None,
                color_weight=np.asarray(data["subs_color_weight"][i])
                if saved_color else None,
            )
            tr._subs.append(Submap(
                world_from_submap=np.asarray(data["anchors"][i],
                                             np.float32),
                volume=vol,
                frames=int(data["sub_frames"][i]),
            ))
    tr._active_id = active_id
    if active_id >= 0:
        tr._anchor = tr._subs[active_id].world_from_submap
        inner._vol = jax.tree.map(jnp.asarray, tr._subs[active_id].volume)
        if not tr.config.offload_finished:
            tr._subs = [
                s._replace(volume=jax.tree.map(jnp.asarray, s.volume))
                for s in tr._subs
            ]
    else:
        inner._vol = None
    if "pose" in data:
        inner._pose = jnp.asarray(data["pose"])
        inner._pose_np = np.asarray(data["pose"], np.float32)
    else:
        inner._pose = None
        inner._pose_np = None
    inner._index = int(data["frame_index"])
    tr._frames_in_active = int(data["frames_in_active"])
    tr._span_log = [(int(a), int(b)) for a, b in data["span_log"]]
    traj = Trajectory()
    for ts, T in zip(data["traj_timestamps"], data["traj_poses"]):
        traj.append(float(ts), T)
    tr.trajectory = traj
    tr._pose_np = (np.asarray(traj.poses[-1], np.float32)
                   if traj.poses else None)
