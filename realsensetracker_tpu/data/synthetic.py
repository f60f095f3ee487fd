"""Synthetic depth rendering: hardware-free data source.

TPU-native analog of the reference's RandomSource (data_source.hpp:22-41) --
its only camera-free backend -- but geometrically consistent: an analytic
raycast of a sphere/plane scene, so frames rendered from two poses admit an
exact known relative transform. Used by tests and the benchmark; real data
comes from data/tum.py and data/recorded.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from realsensetracker_tpu.geometry import camera, se3

_INF = 1e30


class Scene(NamedTuple):
    sphere_centers: jnp.ndarray  # (S, 3) world
    sphere_radii: jnp.ndarray  # (S,)
    floor_y: float = 1.2
    wall_z: float = 4.0


def default_scene(num_spheres: int = 12, seed: int = 0) -> Scene:
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    centers = jax.random.uniform(
        k1,
        (num_spheres, 3),
        dtype=jnp.float32,
        minval=jnp.array([-1.5, -0.8, 1.0], jnp.float32),
        maxval=jnp.array([1.5, 1.0, 3.5], jnp.float32),
    )
    radii = jax.random.uniform(k2, (num_spheres,), dtype=jnp.float32, minval=0.15, maxval=0.45)
    return Scene(sphere_centers=centers, sphere_radii=radii)


def render_depth(intr: camera.Intrinsics, T_wc: jnp.ndarray, scene: Scene) -> jnp.ndarray:
    """Z-depth image of the scene from camera pose T_wc (camera->world)."""
    u = jnp.arange(intr.width, dtype=jnp.float32)
    v = jnp.arange(intr.height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    d_cam = jnp.stack(
        [(uu - intr.cx) / intr.fx, (vv - intr.cy) / intr.fy, jnp.ones_like(uu)], axis=-1
    )  # (H, W, 3), z = 1 so ray parameter t == z-depth
    R = se3.rotation(T_wc)
    o = se3.translation(T_wc)
    # precision=HIGHEST: the TPU's default bf16 matmul would bend rays by
    # ~5e-4 relative, breaking the exact-geometry guarantee tests rely on.
    w = jnp.matmul(d_cam, R.T, precision=jax.lax.Precision.HIGHEST)

    t_best = jnp.full(uu.shape, _INF, dtype=jnp.float32)

    # Spheres.
    oc = o - scene.sphere_centers  # (S, 3)
    a = jnp.sum(w * w, axis=-1)[..., None]  # (H, W, 1)
    # precision=HIGHEST: |oc| ~ O(100), so default bf16 operand rounding
    # would perturb ray-sphere intersections by millimeters.
    b = 2.0 * jnp.einsum("hwi,si->hws", w, oc, precision=jax.lax.Precision.HIGHEST)
    c = jnp.sum(oc * oc, axis=-1) - scene.sphere_radii**2  # (S,)
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_s = (-b - sq) / (2.0 * a)
    t_s = jnp.where((disc > 0) & (t_s > 1e-3), t_s, _INF)
    t_best = jnp.minimum(t_best, jnp.min(t_s, axis=-1))

    # Floor plane y = floor_y (normal -y up; hit from above).
    t_f = (scene.floor_y - o[1]) / jnp.where(jnp.abs(w[..., 1]) > 1e-9, w[..., 1], 1e-9)
    t_best = jnp.minimum(t_best, jnp.where(t_f > 1e-3, t_f, _INF))

    # Back wall z = wall_z.
    t_w = (scene.wall_z - o[2]) / jnp.where(jnp.abs(w[..., 2]) > 1e-9, w[..., 2], 1e-9)
    t_best = jnp.minimum(t_best, jnp.where(t_w > 1e-3, t_w, _INF))

    return jnp.where(t_best < _INF, t_best, 0.0)


def render_pair(
    intr: camera.Intrinsics,
    motion_twist: jnp.ndarray,
    scene: Scene | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render (depth0, depth1, T_rel): frame1's camera displaced by the twist.

    T_rel maps camera-1 coordinates into camera-0 coordinates, i.e. it is the
    transform a src=frame1 -> dst=frame0 registration should estimate.
    """
    if scene is None:
        scene = default_scene()
    T_wc0 = se3.identity()
    T_c0_c1 = se3.exp(motion_twist)
    T_wc1 = se3.compose(T_wc0, T_c0_c1)
    depth0 = render_depth(intr, T_wc0, scene)
    depth1 = render_depth(intr, T_wc1, scene)
    return depth0, depth1, T_c0_c1


def render_trajectory(
    intr: camera.Intrinsics,
    num_frames: int,
    scene: Scene | None = None,
    seed: int = 0,
    step_scale: float = 0.02,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render a smooth random-walk trajectory.

    Returns (depths (F, H, W), poses_wc (F, 4, 4)).
    """
    if scene is None:
        scene = default_scene()
    key = jax.random.PRNGKey(seed)
    twists = step_scale * jax.random.normal(key, (num_frames - 1, 6), dtype=jnp.float32)
    twists = twists.at[:, 3:].multiply(0.5)
    poses = [se3.identity()]
    for i in range(num_frames - 1):
        poses.append(se3.compose(poses[-1], se3.exp(twists[i])))
    poses = jnp.stack(poses)
    depths = jax.vmap(lambda T: render_depth(intr, T, scene))(poses)
    return depths, poses
