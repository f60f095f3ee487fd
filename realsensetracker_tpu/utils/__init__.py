from realsensetracker_tpu.utils.profiling import UTimer, StageTimes  # noqa: F401
