from realsensetracker_tpu.ops.cloud import Cloud  # noqa: F401
from realsensetracker_tpu.ops import (  # noqa: F401
    cloud,
    correspond,
    fpfh,
    normals,
    pyramid,
    sampling,
    voxel,
)
