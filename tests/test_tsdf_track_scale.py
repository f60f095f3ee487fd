"""Reduced-resolution frame-to-model tracking (TsdfConfig.track_scale).

track_scale=s renders the model and runs the ICP at (H/s, W/s) -- the
raycast gather bill, the tracked step's dominant cost on-chip
(BENCHMARKS.md "Raycast phase split"), drops ~s^2-fold -- while the
FULL-resolution frame still integrates, so the fused map is unchanged.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from realsensetracker_tpu.align.projective import ProjectiveIcpConfig
from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.mapping import tsdf
from realsensetracker_tpu.tracking.tsdf_tracker import TsdfTracker

# 160x120 so the tracking resolution at scale 2 is the proven 80x60
# test scale (the 40x30 one level below carries too few planes for a
# reliable 6-DOF solve on the sphere scene).
W, H = 160, 120
INTR = camera.Intrinsics(
    fx=128.0, fy=128.0, cx=(W - 1) / 2, cy=(H - 1) / 2, width=W, height=H
)
CFG = tsdf.TsdfConfig(
    resolution=64,
    voxel_size=0.1,
    origin=(-3.2, -2.4, -0.3),
    trunc=0.3,
    max_range=5.0,
)
ICP = ProjectiveIcpConfig(iters=(3, 3), inner_iters=2, samples=768,
                          min_samples=192)


def _trajectory(n=6):
    scene = synthetic.default_scene(seed=3)
    return synthetic.render_trajectory(
        INTR, n, scene=scene, seed=1, step_scale=0.01
    )


class TestTrackScale:
    def test_tracks_at_half_resolution(self):
        depths, gt = _trajectory(6)
        tr = TsdfTracker(INTR, volume=CFG._replace(track_scale=2), icp=ICP)
        for i in range(6):
            res = tr.process(depths[i], float(i))
            assert res.success, f"frame {i} lost tracking"
        gt = np.asarray(gt)
        rel_gt = np.linalg.inv(gt[0]) @ gt[5]
        err = np.linalg.norm(np.asarray(tr.pose)[:3, 3] - rel_gt[:3, 3])
        # Half-res tracking trades a little accuracy for the ~4x gather
        # cut at this tiny 160x120 / 10 cm-voxel test scale (measured
        # ~0.020 vs <0.02 full-res; same budget the coarse-raycast test
        # grants in tests/test_tsdf.py).
        assert err < 0.035, f"ATE {err:.4f} m"

    def test_integration_stays_full_resolution(self):
        """The fused volume must come from FULL-res frames: on a static
        camera (registration ~identity at either scale) the track_scale=2
        volume matches the full-res volume closely -- a half-res
        integration would observe ~4x fewer pixels and diverge."""
        depths, _ = _trajectory(3)
        static = [depths[0]] * 3
        vols = []
        for s in (1, 2):
            tr = TsdfTracker(INTR, volume=CFG._replace(track_scale=s),
                             icp=ICP)
            for i, d in enumerate(static):
                assert tr.process(d, float(i)).success
            vols.append(tr.tsdf_volume)
        w1 = np.asarray(vols[0].weight)
        w2 = np.asarray(vols[1].weight)
        # Same voxels observed, nearly identical weights (poses differ
        # only by sub-voxel registration noise on identical frames).
        assert np.mean((w1 > 0) == (w2 > 0)) > 0.999
        diff = np.abs(np.asarray(vols[1].tsdf) - np.asarray(vols[0].tsdf))
        # A handful of truncation-boundary voxels flip sign under the
        # sub-voxel registration noise; everything else matches tightly.
        assert np.mean(diff < 0.05) > 0.999
        assert np.mean(diff) < 1e-3

    def test_window_matches_per_frame(self):
        depths, _ = _trajectory(5)
        cfg = CFG._replace(track_scale=2)
        a = TsdfTracker(INTR, volume=cfg, icp=ICP)
        b = TsdfTracker(INTR, volume=cfg, icp=ICP)
        ra = [a.process(d, float(i)) for i, d in enumerate(depths)]
        rb = b.process_window(depths, [float(i) for i in range(5)],
                              window=4)
        for x, y in zip(ra, rb):
            assert x.success == y.success
            np.testing.assert_allclose(x.pose, y.pose, atol=1e-6)

    def test_non_power_of_two_raises(self):
        tr = TsdfTracker(INTR, volume=CFG._replace(track_scale=3), icp=ICP)
        depths, _ = _trajectory(2)
        tr.process(depths[0], 0.0)  # seed integrates full-res: no check
        with pytest.raises(ValueError, match="power of 2"):
            tr.process(depths[1], 1.0)

    def test_masked_streams_honor_track_scale(self):
        """The batched-serving step (step_tsdf_streams_masked) must apply
        TsdfConfig.track_scale exactly like the single-stream tracker --
        review finding: it previously rendered/registered at full
        resolution, silently ignoring the knob."""
        from realsensetracker_tpu.parallel import streams

        depths, _ = _trajectory(4)
        cfg = CFG._replace(track_scale=2)
        state = streams.blank_tsdf_streams(INTR, cfg, num_streams=1)
        on = jnp.ones((1,), bool)
        for f in range(4):
            state, stats = streams.step_tsdf_streams_masked(
                state, jnp.asarray(depths[f])[None], on,
                on if f == 0 else jnp.zeros((1,), bool),
                INTR, cfg, ICP,
            )
        tr = TsdfTracker(INTR, volume=cfg, icp=ICP)
        for f in range(4):
            assert tr.process(depths[f], float(f)).success
        np.testing.assert_allclose(
            np.asarray(state.poses[0]), np.asarray(tr.pose), atol=1e-5
        )

    def test_photometric_smoke(self):
        """Joint geo+photo registration also runs at the tracking
        resolution (grays mean-pool; the gray CARRY stays full-res)."""
        from realsensetracker_tpu.align.rgbd import RgbdIcpConfig

        depths, _ = _trajectory(4)
        grays = [np.asarray(jnp.clip(d / 5.0, 0.0, 1.0)) for d in depths]
        colors = [np.repeat(g[..., None], 3, axis=-1) for g in grays]
        tr = TsdfTracker(
            INTR, volume=CFG._replace(track_scale=2),
            icp=ICP, use_color=True,
            photometric=RgbdIcpConfig(iters=(3, 3), samples=768,
                                      min_samples=192),
        )
        for i in range(4):
            res = tr.process(depths[i], float(i), color=colors[i])
            assert res.success, f"frame {i} lost tracking"
        # The carried photometric reference stays FULL resolution.
        assert tuple(tr._prev_gray.shape) == (H, W)
