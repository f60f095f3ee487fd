"""Random data sources: hardware-free fake backends.

Ports the reference's RandomSource (data_source.hpp:22-41) -- uniform random
point clouds with a fixed timestep, its only test backend -- and adds a
random DEPTH source matching this framework's image-native pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from realsensetracker_tpu.geometry import camera
from realsensetracker_tpu.ops.cloud import Cloud


@dataclass
class RandomCloudSource:
    """Uniform random clouds in [-1, 1]^3 (ref data_source.hpp:29-36:
    Eigen setRandom is uniform in [-1, 1])."""

    size: int = 128
    timestep: float = 100.0
    seed: int = 0

    def __post_init__(self):
        self._key = jax.random.PRNGKey(self.seed)

    def get_cloud(self, prev_stamp: float) -> tuple[Cloud, float]:
        self._key, sub = jax.random.split(self._key)
        pts = jax.random.uniform(
            sub, (self.size, 3), dtype=jnp.float32, minval=-1.0, maxval=1.0
        )
        return Cloud(points=pts, mask=jnp.ones(self.size, bool)), prev_stamp + self.timestep


@dataclass
class RandomDepthSource:
    """Smooth random depth maps (low-frequency noise), image-native analog."""

    intr: camera.Intrinsics = camera.TUM_DEFAULT
    timestep: float = 1.0 / 30.0
    seed: int = 0

    def __post_init__(self):
        self._key = jax.random.PRNGKey(self.seed)

    def get_depth(self, prev_stamp: float) -> tuple[jnp.ndarray, float]:
        self._key, sub = jax.random.split(self._key)
        coarse = jax.random.uniform(
            sub, (self.intr.height // 16, self.intr.width // 16), dtype=jnp.float32,
            minval=1.0, maxval=3.0,
        )
        depth = jax.image.resize(
            coarse, (self.intr.height, self.intr.width), method="bilinear"
        )
        return depth, prev_stamp + self.timestep
