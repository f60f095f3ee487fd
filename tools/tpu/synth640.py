"""Synthesize the 120-frame 640x480 out-and-back TUM sequence used for the
on-TPU SLAM runs (BENCHMARKS.md run 2/3 recipe re-created after the
container reset lost .data/). CPU-only; safe to run alongside a TPU job."""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from realsensetracker_tpu.data import synthetic, tum

OUT = "/root/repo/.data/synth640"
F = 120
rng = np.random.RandomState(7)
# 60 forward steps with mild jitter, then the exact reverse: an
# out-and-back loop that revisits every pose (dense loop closures).
fwd = np.zeros((60, 6), np.float32)
fwd[:, 2] = 0.025  # advance along +z
fwd[:, 0:2] = 0.004 * rng.randn(60, 2)  # translational jitter
fwd[:, 3:6] = 0.006 * rng.randn(60, 3)  # small rotations
back = -fwd[::-1][:59]
twists = np.concatenate([fwd, back], 0)  # 119 steps -> 120 frames
poses = synthetic.poses_from_twists(jnp.asarray(twists))
tum.synthesize_tum_sequence(OUT, num_frames=F, width=640, height=480,
                            poses=poses)
print("WROTE", OUT, F)
