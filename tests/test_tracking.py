"""Tracking-layer tests: frame-to-frame VO, keyframe tracking, trajectory
I/O and ATE (BASELINE configs 2-3)."""

import os

import jax.numpy as jnp
import numpy as np

from realsensetracker_tpu.align import projective
from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera, se3
from realsensetracker_tpu.tracking.frame_to_frame import FrameToFrameTracker
from realsensetracker_tpu.tracking.keyframe import KeyframeTracker
from realsensetracker_tpu.tracking.trajectory import Trajectory, absolute_trajectory_error

INTR = camera.Intrinsics(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)
CFG = projective.ProjectiveIcpConfig(iters=(6, 6, 8), samples=2048)


def _trajectory_frames(n=8, seed=0, step=0.02):
    depths, poses = synthetic.render_trajectory(INTR, n, seed=seed, step_scale=step)
    return depths, poses


def _ate_of(tracker, depths, poses_gt):
    for i in range(depths.shape[0]):
        tracker.process(depths[i], timestamp=float(i))
    gt = Trajectory()
    for i in range(depths.shape[0]):
        gt.append(float(i), np.asarray(poses_gt[i]))
    return absolute_trajectory_error(tracker.trajectory, gt)


class TestFrameToFrame:
    def test_tracks_synthetic_trajectory(self):
        depths, poses = _trajectory_frames(8)
        tracker = FrameToFrameTracker(INTR, CFG)
        ate = _ate_of(tracker, depths, poses)
        assert ate["pairs"] == 8
        assert ate["rmse"] < 0.02

    def test_world_model_grows(self):
        depths, _ = _trajectory_frames(4)
        tracker = FrameToFrameTracker(INTR, CFG, map_capacity=65536, map_voxel_size=0.05)
        for i in range(4):
            tracker.process(depths[i])
        assert int(tracker.world_map.count()) > 100

    def test_failure_holds_pose_and_reference(self):
        depths, _ = _trajectory_frames(3)
        tracker = FrameToFrameTracker(INTR, CFG, min_inlier_fraction=0.2)
        tracker.process(depths[0])
        pose_before = np.asarray(tracker.pose)
        # An empty frame cannot register: failure branch must hold the pose
        # (ref rs_replay_app.cpp:266-273).
        res = tracker.process(jnp.zeros_like(depths[0]))
        assert not res.success
        np.testing.assert_array_equal(np.asarray(tracker.pose), pose_before)
        # Recovery: next good frame registers against the HELD reference.
        res2 = tracker.process(depths[1])
        assert res2.success

    def test_reset(self):
        depths, _ = _trajectory_frames(2)
        tracker = FrameToFrameTracker(INTR, CFG)
        tracker.process(depths[0])
        tracker.process(depths[1])
        tracker.reset()
        assert len(tracker.trajectory) == 0
        res = tracker.process(depths[0])
        assert res.frame_index == 0


class TestKeyframe:
    def test_long_feedback_loop_stays_orthonormal(self):
        """Regression: the warm-start feedback loop (pose = kf @ icp(init =
        inv(kf) @ pose)) amplified rotation denormalization ~3x per frame
        (2e-7 seed -> 1e-2 by frame 12 -> tracking collapse). With
        se3.orthonormalize at the accumulation point, a 24-frame forced-
        keyframe out-and-back run must stay orthonormal, successful, and
        millimeter-accurate."""
        scene = synthetic.default_scene(seed=4)
        step = jnp.asarray([0.02, 0.0, 0.015, 0.0, 0.018, 0.0], jnp.float32)
        twists = [step] * 12 + [-step] * 11
        poses = [se3.identity()]
        for tw in twists:
            poses.append(se3.compose(poses[-1], se3.exp(tw)))
        depths = [synthetic.render_depth(INTR, T, scene) for T in poses]
        P = np.asarray(jnp.stack(poses))

        cfg = projective.ProjectiveIcpConfig(
            iters=(3, 3, 3, 2), inner_iters=2, samples=1024
        )
        tr = KeyframeTracker(INTR, cfg)
        tr.max_translation = 1e-6  # force a promotion (feedback) every frame
        tr.max_rotation = 1e-6
        n_fail = 0
        for i in range(len(poses)):
            res = tr.process(depths[i], float(i))
            n_fail += 0 if res.success else 1
        assert n_fail == 0
        R = np.asarray(tr.pose)[:3, :3]
        assert np.abs(R.T @ R - np.eye(3)).max() < 1e-5
        t_err = np.linalg.norm(np.asarray(tr.pose)[:3, 3] - P[-1][:3, 3])
        assert t_err < 0.01  # meters

    def test_recovery_reseeds_keyframe_after_failures(self):
        """After max_consecutive_failures the CURRENT frame becomes the
        keyframe (pose held) so tracking can resume -- without this a
        transient degeneracy locks the tracker on a stale keyframe."""
        scene = synthetic.default_scene(seed=0)
        good = synthetic.render_depth(INTR, se3.identity(), scene)
        tracker = KeyframeTracker(
            INTR, projective.ProjectiveIcpConfig(iters=(2, 2, 2), samples=512),
            max_consecutive_failures=3,
        )
        tracker.process(good, 0.0)
        # Unregistrable frames: all-invalid depth.
        bad = jnp.zeros_like(good)
        reseeded = False
        for k in range(4):
            res = tracker.process(bad, 1.0 + k)
            assert not res.success
            reseeded = reseeded or res.is_new_keyframe
        assert reseeded  # the 3rd failure re-seeded (pose held)
        # A frame matching the re-seeded (empty) keyframe still fails, but a
        # NEW re-seed cycle eventually accepts real content again.
        far = synthetic.render_depth(
            INTR, se3.exp(jnp.asarray([1.0, 0, 0, 0, 1.0, 0], jnp.float32)), scene
        )
        recovered = False
        for k in range(8):
            res = tracker.process(far, 10.0 + k)
            recovered = recovered or res.success
        assert recovered

    def test_tracks_with_fewer_reference_switches(self):
        depths, poses = _trajectory_frames(8, step=0.01)
        tracker = KeyframeTracker(INTR, CFG)
        n_kf = 0
        for i in range(8):
            res = tracker.process(depths[i])
            assert res.success
            n_kf += int(res.is_new_keyframe)
        assert n_kf < 8  # small motion: most frames track the same keyframe
        gt = Trajectory()
        for i in range(8):
            gt.append(float(i), np.asarray(poses[i]))
        ate = absolute_trajectory_error(tracker.trajectory, gt)
        assert ate["rmse"] < 0.02

    def test_large_motion_promotes_keyframe(self):
        depths, _ = _trajectory_frames(2, step=0.03)
        tracker = KeyframeTracker(INTR, CFG, max_translation=1e-9, max_rotation=1e-9)
        tracker.process(depths[0])
        res = tracker.process(depths[1])
        assert res.is_new_keyframe  # any motion exceeds the zero threshold


class TestTrajectoryIO:
    def test_tum_roundtrip(self, tmp_path):
        traj = Trajectory()
        rng = np.random.RandomState(0)
        for i in range(5):
            T = np.asarray(
                se3.exp(jnp.asarray(0.3 * rng.randn(6), jnp.float32))
            )
            traj.append(i * 0.1, T)
        path = os.path.join(tmp_path, "traj.txt")
        traj.save_tum(path)
        loaded = Trajectory.load_tum(path)
        assert len(loaded) == 5
        for a, b in zip(traj.poses, loaded.poses):
            np.testing.assert_allclose(a[:3], b[:3], atol=1e-4)

    def test_ate_zero_for_identical(self):
        traj = Trajectory()
        for i in range(4):
            T = np.eye(4)
            T[:3, 3] = [i * 0.1, 0, 0]
            traj.append(float(i), T)
        ate = absolute_trajectory_error(traj, traj)
        assert ate["rmse"] < 1e-9

    def test_rpe_measures_drift_rate(self):
        from realsensetracker_tpu.tracking.trajectory import relative_pose_error

        gt = Trajectory()
        est = Trajectory()
        for i in range(11):
            T = np.eye(4)
            T[:3, 3] = [i * 0.1, 0, 0]  # 1 m/s at 10 Hz
            E = np.eye(4)
            E[:3, 3] = [i * 0.11, 0, 0]  # 10% scale drift
            gt.append(i * 0.1, T)
            est.append(i * 0.1, E)
        rpe = relative_pose_error(est, gt, delta=1.0)
        assert rpe["pairs"] >= 1
        np.testing.assert_allclose(rpe["trans_rmse"], 0.1, atol=1e-6)
        assert rpe["rot_rmse_deg"] < 1e-6
        # Identical trajectories: zero drift.
        zero = relative_pose_error(gt, gt, delta=1.0)
        assert zero["trans_rmse"] < 1e-12

    def test_rpe_rotational_component(self):
        from realsensetracker_tpu.tracking.trajectory import relative_pose_error

        gt = Trajectory()
        est = Trajectory()
        for i in range(6):
            T = np.eye(4)
            gt.append(float(i), T)
            # est accumulates 2 degrees of yaw per second vs static gt.
            R = np.asarray(
                se3.exp(jnp.asarray([0, 0, 0, 0, 0, np.radians(2.0) * i],
                                    jnp.float32))
            )
            est.append(float(i), np.asarray(R, np.float64))
        rpe = relative_pose_error(est, gt, delta=1.0)
        np.testing.assert_allclose(rpe["rot_rmse_deg"], 2.0, atol=1e-3)

    def test_ate_invariant_to_global_transform(self):
        rng = np.random.RandomState(1)
        gt = Trajectory()
        est = Trajectory()
        G = np.asarray(se3.exp(jnp.asarray(rng.randn(6) * 0.5, jnp.float32)), np.float64)
        for i in range(6):
            T = np.eye(4)
            T[:3, 3] = rng.randn(3)
            gt.append(float(i), T)
            est.append(float(i), G @ T)
        ate = absolute_trajectory_error(est, gt)
        assert ate["rmse"] < 1e-5


class TestFrameToModel:
    def test_tracks_against_model(self):
        from realsensetracker_tpu.tracking.frame_to_model import FrameToModelTracker

        depths, poses = _trajectory_frames(5, step=0.01)
        tracker = FrameToModelTracker(
            INTR, voxel_size=0.08, icp_max_iter=32,
            frame_capacity=1024, model_capacity=8192,
        )
        for i in range(5):
            res = tracker.process(depths[i], float(i))
            assert res.success
        # Pose stays close to ground truth (absolute registration to map).
        err = np.abs(np.asarray(se3.log(se3.compose(
            se3.inverse(poses[4]), tracker.pose)))).max()
        assert err < 0.05
        assert int(tracker.world_map.count()) > 100

    def test_failure_gate_holds_pose(self):
        from realsensetracker_tpu.tracking.frame_to_model import FrameToModelTracker

        depths, _ = _trajectory_frames(2)
        tracker = FrameToModelTracker(INTR, frame_capacity=1024, model_capacity=4096,
                                      max_mean_cost=1e-9)  # everything "fails"
        tracker.process(depths[0])
        pose_before = np.asarray(tracker.pose)
        res = tracker.process(depths[1])
        assert not res.success
        np.testing.assert_array_equal(np.asarray(tracker.pose), pose_before)
