from realsensetracker_tpu.loop_closure.detector import (  # noqa: F401
    KeyframeDatabase,
    global_descriptor,
)
