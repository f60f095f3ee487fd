"""Pallas TPU kernels for the hot ops.

The "native compute" layer of the framework (SURVEY.md section 7 stage 5):
fused kernels replacing multi-op XLA graphs on the registration hot path.

* level_kernel: fused depth -> plane table [n | d = n.q] for one pyramid
  level (the destination-frame preprocessing of projective ICP).
"""

from realsensetracker_tpu.kernels.level_kernel import build_level_packed  # noqa: F401
