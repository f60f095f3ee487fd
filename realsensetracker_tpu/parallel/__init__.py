from realsensetracker_tpu.parallel.mesh import make_mesh, balanced_mesh  # noqa: F401
from realsensetracker_tpu.parallel.batched import register_batch, register_batch_sharded  # noqa: F401
from realsensetracker_tpu.parallel.sharded import register_batch_point_sharded  # noqa: F401
from realsensetracker_tpu.parallel.streams import init_streams, step_streams, StreamState  # noqa: F401
