from realsensetracker_tpu.geometry import se3, camera  # noqa: F401
