from realsensetracker_tpu.ops.cloud import Cloud  # noqa: F401
