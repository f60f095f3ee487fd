"""Marching-tetrahedra mesh extraction (mapping/mesh.py).

Geometry oracles: analytic scenes (wall plane, sphere) where the
zero-level surface position, orientation, and area are known exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.mapping import mesh as mesh_mod
from realsensetracker_tpu.mapping import tsdf

W, H = 80, 60
INTR = camera.Intrinsics(
    fx=64.0, fy=64.0, cx=(W - 1) / 2, cy=(H - 1) / 2, width=W, height=H
)

WALL_Z = 3.0
WALL_SCENE = synthetic.Scene(
    sphere_centers=jnp.zeros((0, 3), jnp.float32),
    sphere_radii=jnp.zeros((0,), jnp.float32),
    floor_y=100.0,
    wall_z=WALL_Z,
)
WALL_CFG = tsdf.TsdfConfig(
    resolution=64, voxel_size=0.1, origin=(-3.2, -2.4, -0.3),
    trunc=0.3, max_range=5.0,
)

SPHERE_C = np.array([0.0, 0.0, 2.0], np.float32)
SPHERE_R = 0.6
SPHERE_SCENE = synthetic.Scene(
    sphere_centers=jnp.asarray(SPHERE_C[None]),
    sphere_radii=jnp.asarray([SPHERE_R], jnp.float32),
    floor_y=100.0,
    wall_z=100.0,
)
SPHERE_CFG = tsdf.TsdfConfig(
    resolution=64, voxel_size=0.05, origin=(-1.6, -1.6, 0.4),
    trunc=0.15, max_range=5.0,
)


def _fused(scene, cfg, with_color=False, color_value=0.25):
    depth = synthetic.render_depth(INTR, se3.identity(), scene)
    color = (
        jnp.full((H, W, 3), color_value, jnp.float32) if with_color else None
    )
    vol = tsdf.init_volume(cfg, with_color=with_color)
    return tsdf.integrate(vol, depth, se3.identity(), INTR, cfg, color=color)


def _valid_tris(m):
    return np.asarray(m.vertices)[np.asarray(m.mask)]


def _normals_areas(tris):
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    norm = np.linalg.norm(n, axis=1)
    return n / np.maximum(norm, 1e-12)[:, None], 0.5 * norm


class TestWallMesh:
    def test_plane_position_orientation_area(self):
        vol = _fused(WALL_SCENE, WALL_CFG)
        m = mesh_mod.extract_mesh(vol, WALL_CFG, capacity=32768)
        tris = _valid_tris(m)
        assert len(tris) > 1000
        # Every vertex lies ON the wall plane (linear interpolation of a
        # projective sdf along z is exact for a frontoparallel plane).
        np.testing.assert_allclose(tris[..., 2], WALL_Z, atol=1e-3)
        normals, areas = _normals_areas(tris)
        # Winding faces free space = toward the camera (-z), everywhere.
        assert (normals[:, 2] < -0.999).all()
        assert (areas > 1e-12).all(), "degenerate triangles emitted"
        # Total area matches the independent crossing-column estimate.
        t = np.asarray(vol.tsdf)
        seen = np.asarray(vol.weight) > 0
        cross = (
            (np.sign(t[:, :, :-1]) != np.sign(t[:, :, 1:]))
            & seen[:, :, :-1] & seen[:, :, 1:]
        )
        expected = cross.sum() * WALL_CFG.voxel_size**2
        assert abs(areas.sum() - expected) / expected < 0.10

    def test_empty_volume_no_triangles(self):
        m = mesh_mod.extract_mesh(
            tsdf.init_volume(WALL_CFG), WALL_CFG, capacity=1024
        )
        assert int(m.count()) == 0

    def test_capacity_overflow_uniform(self):
        vol = _fused(WALL_SCENE, WALL_CFG)
        m = mesh_mod.extract_mesh(vol, WALL_CFG, capacity=256)
        tris = _valid_tris(m)
        assert len(tris) == 256  # filled exactly to capacity
        # The subsample stays spatially uniform: it still spans the wall.
        big = _valid_tris(
            mesh_mod.extract_mesh(vol, WALL_CFG, capacity=32768)
        )
        for ax in range(2):
            lo, hi = big[..., ax].min(), big[..., ax].max()
            assert tris[..., ax].min() < lo + 0.3 * (hi - lo)
            assert tris[..., ax].max() > hi - 0.3 * (hi - lo)


class TestSphereMesh:
    def test_radius_and_outward_winding(self):
        vol = _fused(SPHERE_SCENE, SPHERE_CFG)
        m = mesh_mod.extract_mesh(vol, SPHERE_CFG, capacity=32768)
        tris = _valid_tris(m)
        assert len(tris) > 500
        r = np.linalg.norm(tris.reshape(-1, 3) - SPHERE_C, axis=1)
        # Sub-voxel surface accuracy (projective-TSDF bias < voxel/2).
        assert abs(r.mean() - SPHERE_R) < 0.5 * SPHERE_CFG.voxel_size
        assert np.abs(r - SPHERE_R).max() < SPHERE_CFG.voxel_size
        normals, _ = _normals_areas(tris)
        outward = tris.mean(axis=1) - SPHERE_C
        outward /= np.linalg.norm(outward, axis=1)[:, None]
        assert ((normals * outward).sum(axis=1) > 0).all()


class TestColoredMesh:
    def test_constant_color_survives(self):
        vol = _fused(SPHERE_SCENE, SPHERE_CFG, with_color=True)
        m = mesh_mod.extract_mesh(
            vol, SPHERE_CFG, capacity=32768, with_color=True
        )
        cols = np.asarray(m.colors)[np.asarray(m.mask)]
        assert len(cols) > 500
        # The color-weight gate keeps uncolored straddle voxels from
        # darkening vertices: a constant-color scene meshes at exactly
        # that color.
        np.testing.assert_allclose(cols, 0.25, atol=1e-5)

    def test_uncolored_volume_rejected(self):
        vol = _fused(SPHERE_SCENE, SPHERE_CFG)
        with pytest.raises(ValueError, match="color"):
            mesh_mod.extract_mesh(
                vol, SPHERE_CFG, capacity=1024, with_color=True
            )


class TestWeldExport:
    def test_weld_reconnects_soup(self):
        from realsensetracker_tpu.vis.render import weld_mesh

        vol = _fused(SPHERE_SCENE, SPHERE_CFG)
        tris = _valid_tris(
            mesh_mod.extract_mesh(vol, SPHERE_CFG, capacity=32768)
        )
        verts, faces = weld_mesh(tris)
        # The Kuhn decomposition is conforming, so shared vertices merge:
        # far fewer unique vertices than 3T (a closed triangulated
        # surface has V ~ T/2).
        assert len(verts) < 0.8 * 3 * len(tris)
        assert faces.shape == (len(tris), 3)
        assert faces.min() >= 0 and faces.max() < len(verts)
        # Welding is lossless: indexing reconstructs the soup.
        np.testing.assert_allclose(verts[faces], tris, atol=1e-5)

    def test_export_mesh_ply(self, tmp_path):
        from realsensetracker_tpu.vis.render import export_mesh_ply

        vol = _fused(SPHERE_SCENE, SPHERE_CFG, with_color=True)
        m = mesh_mod.extract_mesh(
            vol, SPHERE_CFG, capacity=4096, with_color=True
        )
        keep = np.asarray(m.mask)
        tris = np.asarray(m.vertices)[keep]
        cols = np.asarray(m.colors)[keep]
        path = str(tmp_path / "mesh.ply")
        export_mesh_ply(path, tris, cols)
        lines = open(path).read().splitlines()
        assert lines[0] == "ply"
        nv = int(next(x for x in lines if x.startswith("element vertex")).split()[-1])
        nf = int(next(x for x in lines if x.startswith("element face")).split()[-1])
        assert nf == len(tris)
        body = lines[lines.index("end_header") + 1:]
        assert len(body) == nv + nf
        # Vertex rows carry RGB; face rows are index triples in range.
        assert len(body[0].split()) == 6
        last = body[-1].split()
        assert last[0] == "3" and all(0 <= int(i) < nv for i in last[1:])


class TestTrackerIntegration:
    def test_world_mesh_via_tracker_and_facade(self):
        from realsensetracker_tpu.align.projective import ProjectiveIcpConfig
        from realsensetracker_tpu.api.config import TrackerConfig
        from realsensetracker_tpu.api.tracker import Tracker

        depths, _ = synthetic.render_trajectory(
            INTR, 3, scene=synthetic.default_scene(seed=3), seed=1,
            step_scale=0.01,
        )
        t = Tracker(TrackerConfig(
            intrinsics=INTR, method="tsdf",
            tsdf=tsdf.TsdfConfig(
                resolution=64, voxel_size=0.1, origin=(-3.2, -2.4, -0.3),
                trunc=0.3, max_range=5.0,
            ),
            projective=ProjectiveIcpConfig(
                iters=(3, 3), inner_iters=2, samples=768, min_samples=192
            ),
        ))
        for i in range(3):
            t.process(depths[i], float(i))
        m = t.world_mesh(capacity=16384)
        assert m is not None and int(m.count()) > 200
        # Non-dense methods return None, not an error.
        t2 = Tracker(TrackerConfig(intrinsics=INTR, method="projective"))
        assert t2.world_mesh() is None


class TestSlamDenseRefusion:
    """Post-optimization dense re-fusion (SlamTracker.build_dense /
    world_mesh): keyframe depths re-integrate at loop-consistent poses."""

    def _run_slam(self, keep_depths=True, n=6):
        from realsensetracker_tpu.align import projective
        from realsensetracker_tpu.tracking.slam import SlamConfig, SlamTracker

        intr = camera.Intrinsics(
            fx=100.0, fy=100.0, cx=49.5, cy=37.0, width=100, height=75
        )
        scene = synthetic.default_scene(seed=21)
        poses = [se3.identity()]
        step = jnp.asarray([0.03, 0.0, 0.02, 0.0, 0.025, 0.0], jnp.float32)
        for _ in range(n - 1):
            poses.append(se3.compose(poses[-1], se3.exp(step)))
        depths = [synthetic.render_depth(intr, T, scene) for T in poses]
        cfg = SlamConfig(
            intrinsics=intr,
            icp=projective.ProjectiveIcpConfig(iters=(5, 5, 6), samples=1024),
            loop_min_separation=3,
            keyframe_cloud_capacity=1024,
            keep_depths=keep_depths,
        )
        cfg.align.fpfh_max_neighbors = 32
        tracker = SlamTracker(cfg)
        tracker._vo.max_translation = 1e-6  # every frame a keyframe
        tracker._vo.max_rotation = 1e-6
        for i, d in enumerate(depths):
            tracker.process(d, float(i))
        return tracker

    def test_dense_mesh_after_optimize(self):
        tracker = self._run_slam(keep_depths=True)
        tracker.optimize()
        out = tracker.build_dense(voxel_size=0.08, resolution=64)
        assert out is not None
        vol, cfg = out
        # Auto-sizing covers every keyframe cloud point (with margin).
        lo = np.asarray(cfg.origin)
        hi = lo + cfg.resolution * cfg.voxel_size
        for kf in tracker._keyframes:
            pts = np.asarray(kf.cloud.points)[np.asarray(kf.cloud.mask)]
            w = pts @ kf.pose[:3, :3].T + kf.pose[:3, 3]
            assert (w >= lo - 1e-5).all() and (w <= hi + 1e-5).all()
        m = tracker.world_mesh(capacity=32768, voxel_size=0.08, resolution=64)
        tris = _valid_tris(m)
        assert len(tris) > 500
        # The re-fused surface agrees with the sparse world map: every
        # mesh vertex lies near some accumulated map point.
        wm = tracker.world_map
        mp = np.asarray(wm.points)[np.asarray(wm.mask)]
        verts = tris.reshape(-1, 3)[::7]
        d = np.linalg.norm(verts[:, None, :] - mp[None, :, :], axis=-1)
        assert np.percentile(d.min(axis=1), 95) < 3 * cfg.voxel_size

    def test_requires_keep_depths(self):
        tracker = self._run_slam(keep_depths=False)
        with pytest.raises(ValueError, match="keep_depths"):
            tracker.build_dense(voxel_size=0.08, resolution=64)

    def test_world_map_property(self):
        tracker = self._run_slam(keep_depths=False)
        wm = tracker.world_map
        pts = np.asarray(wm.points)[np.asarray(wm.mask)]
        assert len(pts) > 200
