"""optimize_atlas scaling ON the chip: 20-submap synthetic atlas.

Measures wall time + accepted edges with the warped-occupancy mid-gate
on vs off (VERDICT-r4 item 4: 80 s for 7 submaps / 0 edges pre-gate).
ONE TPU process at a time; run from /root/repo as cwd:
    nohup python - < tools/tpu/atlas20_tpu.py > .data/tpu_logs/atlas20.log 2>&1 &
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from realsensetracker_tpu.align.projective import ProjectiveIcpConfig
from realsensetracker_tpu.data import synthetic
from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.mapping import submaps as sm
from realsensetracker_tpu.mapping import tsdf as tsdf_mod

W, H = 640, 480
INTR = camera.TUM_FR1
ICP = ProjectiveIcpConfig()
# Production-ish submap volumes (96^3 x 5 cm, the submap500 shape).
VOL = tsdf_mod.TsdfConfig(resolution=96, voxel_size=0.05,
                          origin=(-2.4, -2.4, -0.525), trunc=0.15,
                          max_range=4.5, raycast_coarse=4)
N = 20


def build_atlas(n=N):
    rng = np.random.RandomState(7)
    centers, radii = [], []
    for m in range(n + 2):
        for _ in range(4):
            centers.append([m * 1.0 + rng.uniform(-0.6, 0.6),
                            rng.uniform(-0.5, 0.7),
                            rng.uniform(1.0, 2.2)])
            radii.append(rng.uniform(0.2, 0.45))
    scene = synthetic.Scene(
        sphere_centers=jnp.asarray(centers, jnp.float32),
        sphere_radii=jnp.asarray(radii, jnp.float32),
        floor_y=1.1, wall_z=50.0,
    )
    xs = [float(i) for i in range(n - 1)] + [0.05]  # last revisits first
    tr = sm.SubmapTsdfTracker(INTR, sm.SubmapConfig(volume=VOL), icp=ICP)
    for i, x in enumerate(xs):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = x
        depth = synthetic.render_depth(INTR, jnp.asarray(pose), scene)
        vol = tsdf_mod.integrate(tsdf_mod.init_volume(VOL), depth,
                                 jnp.eye(4), INTR, VOL)
        tr._subs.append(sm.Submap(world_from_submap=pose.copy(),
                                  volume=jax.tree.map(np.asarray, vol),
                                  frames=1))
        tr._span_log.append((i, i))
        tr.trajectory.append(float(i), pose.copy())
        last_vol, last_pose = vol, pose
    tr._active_id = len(xs) - 1
    tr._anchor = last_pose.copy()
    tr._t._vol = last_vol
    tr._t._pose = jnp.eye(4)
    tr._t._pose_np = np.eye(4, dtype=np.float32)
    tr._pose_np = last_pose.copy()
    return tr


def main():
    print("devices:", jax.devices())
    orig = sm._verify_submap_pairs
    seen = {}

    def spy(surfs, feats, pairs, **kw):
        seen["verified"] = len(pairs)
        seen["extracted"] = len(surfs)
        return orig(surfs, feats, pairs, **kw)

    sm._verify_submap_pairs = spy
    # Variant order is compile-biased (the first run pays every
    # first-use compile); RST_GATES reverses it for a fair A/B across
    # two fresh processes.
    gates = tuple(
        float(g) for g in
        os.environ.get("RST_GATES", "0.25,0.0").split(",")
    )
    for gate in gates:
        tr = build_atlas()
        seen.clear()
        t0 = time.time()
        edges = sm.optimize_atlas(tr, surface_capacity=2048,
                                  occupancy_gate=gate)
        dt = time.time() - t0
        d = np.linalg.norm(tr._subs[0].world_from_submap[:3, 3]
                           - tr._anchor[:3, 3])
        print(f"occupancy_gate={gate}: submaps={N} "
              f"verified_pairs={seen.get('verified', 0)} "
              f"extracted={seen.get('extracted', 0)} edges={edges} "
              f"wall={dt:.1f}s revisit_anchor_gap={d * 1000:.1f}mm",
              flush=True)


if __name__ == "__main__":
    main()
