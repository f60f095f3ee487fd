from realsensetracker_tpu.align.kabsch import solve_kabsch  # noqa: F401
from realsensetracker_tpu.align.icp import align_icp  # noqa: F401
