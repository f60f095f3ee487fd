from realsensetracker_tpu.api.config import (  # noqa: F401
    AlignConfig,
    ReplayConfig,
    TrackerConfig,
)
from realsensetracker_tpu.api.tracker import Tracker  # noqa: F401
