from realsensetracker_tpu.parallel.mesh import make_mesh  # noqa: F401
from realsensetracker_tpu.parallel.batched import register_batch  # noqa: F401
