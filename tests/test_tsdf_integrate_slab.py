"""Frustum-restricted integration (TsdfConfig.integrate_slab).

The slab path must be BIT-identical to the full-volume pass whenever the
frame's frustum AABB fits the static S^3 sub-grid, and must fall back to
the full pass (again identical) when it does not: the update predicate
(in-frustum, valid nearest pixel, sdf >= -trunc) can only hold inside
the AABB the slab is positioned over, so restriction loses nothing.
Covers reference behavior: rs_replay_app.cpp:76-129's world model is
fused from full frames; this is a pure-performance refinement.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.mapping import tsdf

W, H = 80, 60
INTR = camera.Intrinsics(
    fx=64.0, fy=64.0, cx=(W - 1) / 2, cy=(H - 1) / 2, width=W, height=H
)

SCENE = synthetic.Scene(
    sphere_centers=jnp.asarray([[0.3, 0.1, 1.6], [-0.4, -0.2, 1.9]],
                               jnp.float32),
    sphere_radii=jnp.asarray([0.35, 0.3], jnp.float32),
    floor_y=0.8,
    wall_z=2.4,
)

CFG = tsdf.TsdfConfig(
    resolution=64,
    voxel_size=0.1,
    origin=(-3.2, -2.4, -0.3),
    trunc=0.3,
    max_range=5.0,
)


def _depth(pose=None):
    pose = se3.identity() if pose is None else pose
    return synthetic.render_depth(INTR, pose, SCENE)


def _vols_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a.tsdf), np.asarray(b.tsdf))
    np.testing.assert_array_equal(np.asarray(a.weight),
                                  np.asarray(b.weight))
    if a.color is not None:
        np.testing.assert_array_equal(np.asarray(a.color),
                                      np.asarray(b.color))
        np.testing.assert_array_equal(np.asarray(a.color_weight),
                                      np.asarray(b.color_weight))


class TestIntegrateSlab:
    def test_identical_when_fits(self):
        """A near-field scene (depth <= 2.4 m wall) fits a 48^3 slab of
        the 64^3 x 0.1 m grid; the fused result must match the full pass
        exactly, including after several frames at different poses."""
        cfg_s = CFG._replace(integrate_slab=48)
        vol_f, vol_s = tsdf.init_volume(CFG), tsdf.init_volume(cfg_s)
        for i, x in enumerate((0.0, 0.15, -0.1)):
            pose = se3.from_rt(
                jnp.eye(3, dtype=jnp.float32),
                jnp.asarray([x, 0.05 * i, 0.0], jnp.float32),
            )
            d = _depth(pose)
            vol_f = tsdf.integrate(vol_f, d, pose, INTR, CFG)
            vol_s = tsdf.integrate(vol_s, d, pose, INTR, cfg_s)
        _vols_equal(vol_s, vol_f)
        # The scene must actually have fused something.
        assert float(jnp.sum(vol_f.weight)) > 0

    def test_fallback_when_aabb_exceeds_slab(self):
        """A tiny slab (8 voxels = 0.8 m) cannot hold the frustum AABB;
        the frame must take the full path and still match the full
        pass."""
        cfg_s = CFG._replace(integrate_slab=8)
        d = _depth()
        vol_f = tsdf.integrate(tsdf.init_volume(CFG), d,
                               se3.identity(), INTR, CFG)
        vol_s = tsdf.integrate(tsdf.init_volume(cfg_s), d,
                               se3.identity(), INTR, cfg_s)
        _vols_equal(vol_s, vol_f)

    def test_colored_volume(self):
        cfg_s = CFG._replace(integrate_slab=48)
        d = _depth()
        rgb = jnp.broadcast_to(
            jnp.asarray([0.2, 0.5, 0.8], jnp.float32), (H, W, 3)
        )
        vol_f = tsdf.integrate(tsdf.init_volume(CFG, with_color=True), d,
                               se3.identity(), INTR, CFG, color=rgb)
        vol_s = tsdf.integrate(tsdf.init_volume(cfg_s, with_color=True),
                               d, se3.identity(), INTR, cfg_s, color=rgb)
        _vols_equal(vol_s, vol_f)

    def test_all_invalid_frame_is_noop(self):
        cfg_s = CFG._replace(integrate_slab=48)
        d = jnp.zeros((H, W), jnp.float32)  # below min_depth everywhere
        vol0 = tsdf.init_volume(cfg_s)
        vol = tsdf.integrate(vol0, d, se3.identity(), INTR, cfg_s)
        np.testing.assert_array_equal(np.asarray(vol.weight),
                                      np.asarray(vol0.weight))

    def test_tracker_drift_parity(self):
        """Frame-to-model tracking with the slab matches the full-pass
        trajectory (the tracked step's cond(ok, integrate) composes with
        the slab's internal cond)."""
        from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

        depths, poses = synthetic.render_trajectory(
            INTR, 6, scene=SCENE, seed=2, step_scale=0.01
        )
        outs = []
        for slab in (0, 48):
            cfg = CFG._replace(integrate_slab=slab)
            tr = TsdfTracker(intr=INTR, volume=cfg)
            for i in range(6):
                tr.process(depths[i], float(i))
            outs.append(np.stack(tr.trajectory.poses))
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)

    def test_windowed_scan_parity(self):
        """The slab's lax.cond composes with the windowed lax.scan:
        per-frame results identical to the full-pass windowed run."""
        from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

        depths, _ = synthetic.render_trajectory(
            INTR, 7, scene=SCENE, seed=3, step_scale=0.01
        )
        frames = [np.asarray(depths[i], np.float32) for i in range(7)]
        trajs = []
        for slab in (0, 48):
            tr = TsdfTracker(intr=INTR, volume=CFG._replace(
                integrate_slab=slab))
            tr.process(frames[0], 0.0)
            tr.process_window(frames[1:], [float(i) for i in range(1, 7)],
                              window=3)
            trajs.append(np.stack(tr.trajectory.poses))
        np.testing.assert_allclose(trajs[0], trajs[1], atol=1e-6)

    def test_streams_force_slab_off(self):
        """The vmapped multi-stream paths clear integrate_slab before
        tracing (cond would become a both-branches select); results
        must be identical with and without the knob set."""
        from realsensetracker_tpu.align.projective import (
            ProjectiveIcpConfig,
        )
        from realsensetracker_tpu.parallel import streams

        depths, _ = synthetic.render_trajectory(
            INTR, 2, scene=SCENE, seed=5, step_scale=0.008
        )
        seed = jnp.stack([depths[0]] * 2)  # 2 slots
        step = jnp.stack([depths[1]] * 2)
        icp = ProjectiveIcpConfig(iters=(3, 3), inner_iters=2,
                                  samples=768, min_samples=192)
        outs = []
        for slab in (0, 48):
            cfg = CFG._replace(integrate_slab=slab)
            st = streams.init_tsdf_streams(seed, INTR, cfg)
            st, _res = streams.step_tsdf_streams(st, step, INTR, cfg, icp)
            outs.append(np.asarray(st.volume.weight))
        np.testing.assert_array_equal(outs[0], outs[1])
