"""Submap atlas: unbounded dense mapping from fixed-shape TSDF volumes.

A single TsdfVolume covers a fixed metric extent (TsdfConfig.resolution *
voxel_size); a trajectory that walks past it loses the model it tracks
against. The atlas keeps KinectFusion frame-to-model tracking inside the
NEWEST submap and, when the camera (or its view center) drifts past a
spawn radius, freezes the active volume and seeds a fresh one anchored at
the current world pose. The world model becomes a union of rigidly-placed
fixed-shape volumes -- the dense analog of the reference's unbounded
CloudAccumulator world map (rs_replay_app.cpp:76-129), in the
Kintinuous/submap-SLAM lineage.

TPU shape: every submap shares ONE TsdfConfig, so the whole lifetime of
the atlas reuses exactly the compiled programs of a single TsdfTracker
(raycast -> register -> integrate per frame, plus one seed dispatch per
spawn). No dynamic shapes anywhere; the host only does the spawn policy
arithmetic on the (19,) stats row it already receives per frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.align import projective
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.mapping import tsdf as tsdf_mod
from realsensetracker_tpu.ops import cloud as cloud_mod
from realsensetracker_tpu.tracking.trajectory import Trajectory


@dataclass(frozen=True)
class SubmapConfig:
    """Atlas policy knobs (the volume geometry lives in ``volume``)."""

    volume: tsdf_mod.TsdfConfig = tsdf_mod.TsdfConfig()
    spawn_radius: float = 0.0  # meters of camera/view-center drift from
    # the submap seed before a handover; 0 = auto (extent / 4)
    probe_depth: float = 0.0  # view-center probe distance along the
    # optical axis (captures rotation-induced frustum exit); 0 = auto
    # (extent / 4)
    min_frames: int = 4  # frames a submap must absorb before the next
    # spawn (guards against thrashing on a fast pan)
    offload_finished: bool = True  # move frozen volumes to host RAM
    # (HBM holds only the active one); extraction re-uploads on demand

    def radius(self) -> float:
        extent = self.volume.resolution * self.volume.voxel_size
        return self.spawn_radius or extent / 4.0

    def probe(self) -> float:
        extent = self.volume.resolution * self.volume.voxel_size
        return self.probe_depth or extent / 4.0


class Submap(NamedTuple):
    """A frozen atlas entry."""

    world_from_submap: np.ndarray  # (4, 4) float32, host
    volume: object  # TsdfVolume (host leaves when offloaded)
    frames: int  # frames fused into it


def _to_host(vol):
    return jax.tree.map(np.asarray, vol)


def _to_device(vol):
    return jax.tree.map(jnp.asarray, vol)


class SubmapTsdfTracker:
    """TsdfTracker facade over a growing atlas of fixed-shape submaps.

    Same streaming surface as tracking.tsdf_tracker.TsdfTracker
    (process / process_window / pose / trajectory / world_map /
    world_mesh / ...), but poses are WORLD poses (anchor-composed) and
    the world model is the union of all submaps.
    """

    def __init__(
        self,
        intr: camera.Intrinsics,
        config: SubmapConfig = SubmapConfig(),
        icp: projective.ProjectiveIcpConfig = projective.ProjectiveIcpConfig(),
        min_inlier_fraction: float = 0.2,
        surface_capacity: int = 65536,
        use_color: bool = False,
    ):
        from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

        self.intr = intr
        self.config = config
        self.surface_capacity = surface_capacity
        self.use_color = use_color
        # Inner tracker runs in the ACTIVE submap frame; its own
        # trajectory is ignored (ours is the world one).
        self._t = TsdfTracker(
            intr, volume=config.volume, icp=icp,
            min_inlier_fraction=min_inlier_fraction,
            surface_capacity=surface_capacity, use_color=use_color,
        )
        self._anchor = np.eye(4, dtype=np.float32)  # world_from_submap
        self._frames_in_active = 0
        self.finished: list[Submap] = []
        self.trajectory = Trajectory()
        self._pose_np = None  # last world pose (host)

    # -- policy ---------------------------------------------------------

    def _drifted(self, local_pose: np.ndarray) -> bool:
        """Spawn test on the ACTIVE-submap-frame pose: camera position or
        mid-range view center moved > spawn_radius from where the submap
        was seeded (identity / (0,0,probe))."""
        r = self.config.radius()
        t = local_pose[:3, 3]
        if float(np.linalg.norm(t)) > r:
            return True
        d = self.config.probe()
        view = local_pose[:3, :3] @ np.array([0.0, 0.0, d], np.float32) + t
        return float(np.linalg.norm(view - np.array([0.0, 0.0, d]))) > r

    def _maybe_spawn(self, depth, color, world_pose: np.ndarray) -> bool:
        if self._frames_in_active < self.config.min_frames:
            return False
        if not self._drifted(np.asarray(self._t.pose)):
            return False
        vol = self._t.tsdf_volume
        # The frozen model raycast at the handover pose IS a depth frame
        # in the new submap's camera frame: fusing it hands the old
        # submap's accumulated (denoised) surface to the new one.
        handover = tsdf_mod.render_model_depth(
            vol, jnp.asarray(self._t.pose), self.intr, self.config.volume
        )
        self.finished.append(Submap(
            world_from_submap=self._anchor,
            volume=_to_host(vol) if self.config.offload_finished else vol,
            frames=self._frames_in_active,
        ))
        self._anchor = np.asarray(world_pose, np.float32).copy()
        # Handover frame fuses into BOTH volumes: process() already
        # integrated it into the frozen one; reseed fuses it (at
        # identity, together with the model render) as the new submap's
        # first surface, so the next frame tracks against a real render
        # -- no open-loop coast.
        self._t.reseed(depth, color=color, model_depth=handover)
        self._frames_in_active = 1
        return True

    # -- streaming ------------------------------------------------------

    def process(self, depth, timestamp: float | None = None, color=None):
        r = self._t.process(depth, timestamp, color=color)
        world_pose = (self._anchor @ r.pose).astype(np.float32)
        self._pose_np = world_pose
        self._frames_in_active += 1
        ts = timestamp if timestamp is not None else float(r.frame_index)
        self.trajectory.append(ts, world_pose)
        if r.success:
            self._maybe_spawn(depth, color, world_pose)
        return r._replace(pose=world_pose)

    def process_window(self, depths, timestamps=None, window: int = 8,
                       colors=None):
        """Windowed variant: frames scan in up-to-``window`` chunks
        (TsdfTracker.process_window); the spawn check runs BETWEEN
        chunks, so a handover can land up to window-1 frames late --
        size spawn_radius with that slack (the default extent/4 leaves
        ~2x margin inside the volume)."""
        n = len(depths)
        if timestamps is None:
            timestamps = [None] * n
        results = []
        i = 0
        while i < n:
            chunk = depths[i:i + window]
            cts = timestamps[i:i + window]
            cols = colors[i:i + window] if colors is not None else None
            rs = self._t.process_window(chunk, cts, window=window,
                                        colors=cols)
            for j, r in enumerate(rs):
                world_pose = (self._anchor @ r.pose).astype(np.float32)
                self._pose_np = world_pose
                self._frames_in_active += 1
                ts = cts[j] if cts[j] is not None else float(r.frame_index)
                self.trajectory.append(ts, world_pose)
                results.append(r._replace(pose=world_pose))
            if results and results[-1].success:
                self._maybe_spawn(
                    chunk[-1],
                    cols[-1] if cols is not None else None,
                    results[-1].pose,
                )
            i += len(rs)
        return results

    # -- state ----------------------------------------------------------

    @property
    def pose(self):
        return self._pose_np

    @property
    def tsdf_volume(self):
        """The ACTIVE submap's device volume (None before the seed)."""
        return self._t.tsdf_volume

    @property
    def anchor(self) -> np.ndarray:
        """world_from_submap of the active submap."""
        return self._anchor

    @property
    def num_submaps(self) -> int:
        return len(self.finished) + (1 if self._t.tsdf_volume is not None
                                     else 0)

    def _all_volumes(self):
        """(world_from_submap, device TsdfVolume) for every submap,
        active last."""
        out = [(s.world_from_submap, _to_device(s.volume))
               for s in self.finished]
        if self._t.tsdf_volume is not None:
            out.append((self._anchor, self._t.tsdf_volume))
        return out

    # -- world-model extraction ------------------------------------------

    @property
    def world_map(self):
        """Union of all submap zero-level surfaces as ONE masked Cloud
        (surface_capacity points per submap, world frame)."""
        vols = self._all_volumes()
        if not vols:
            return None
        pts, masks = [], []
        for anchor, vol in vols:
            c = tsdf_mod.extract_surface(vol, self.config.volume,
                                         self.surface_capacity)
            a = jnp.asarray(anchor)
            pts.append(c.points @ a[:3, :3].T + a[:3, 3])
            masks.append(c.mask)
        return cloud_mod.Cloud(points=jnp.concatenate(pts),
                               mask=jnp.concatenate(masks))

    @property
    def world_map_oriented(self):
        """(Cloud, normals): union surface with TSDF-gradient normals
        rotated into the world frame."""
        vols = self._all_volumes()
        if not vols:
            return None
        pts, masks, nrms = [], [], []
        for anchor, vol in vols:
            c, nrm = tsdf_mod.extract_surface_oriented(
                vol, self.config.volume, self.surface_capacity
            )
            a = jnp.asarray(anchor)
            pts.append(c.points @ a[:3, :3].T + a[:3, 3])
            nrms.append(nrm @ a[:3, :3].T)
            masks.append(c.mask)
        return (cloud_mod.Cloud(points=jnp.concatenate(pts),
                                mask=jnp.concatenate(masks)),
                jnp.concatenate(nrms))

    @property
    def world_map_colored(self):
        """(Cloud, colors) union; None unless use_color."""
        if not self.use_color:
            return None
        vols = self._all_volumes()
        if not vols:
            return None
        pts, masks, cols = [], [], []
        for anchor, vol in vols:
            c, col = tsdf_mod.extract_surface_colored(
                vol, self.config.volume, self.surface_capacity
            )
            a = jnp.asarray(anchor)
            pts.append(c.points @ a[:3, :3].T + a[:3, 3])
            cols.append(col)
            masks.append(c.mask)
        return (cloud_mod.Cloud(points=jnp.concatenate(pts),
                                mask=jnp.concatenate(masks)),
                jnp.concatenate(cols))

    def world_mesh(self, capacity: int = 131072):
        """Union triangle mesh: each submap contributes up to
        capacity/num_submaps triangles (floor 4096), vertices transformed
        into the world frame. Triangle soups concatenate exactly
        (vis.render.export_mesh_ply welds at export)."""
        from realsensetracker_tpu.mapping.mesh import TriangleMesh, extract_mesh

        vols = self._all_volumes()
        if not vols:
            return None
        per = max(4096, capacity // len(vols))
        verts, masks, cols = [], [], []
        for anchor, vol in vols:
            m = extract_mesh(vol, self.config.volume, per,
                             with_color=self.use_color)
            a = jnp.asarray(anchor)
            verts.append(m.vertices @ a[:3, :3].T + a[:3, 3])
            masks.append(m.mask)
            if m.colors is not None:
                cols.append(m.colors)
        return TriangleMesh(
            vertices=jnp.concatenate(verts),
            mask=jnp.concatenate(masks),
            colors=jnp.concatenate(cols) if cols else None,
        )
