from realsensetracker_tpu.tracking.accumulator import MapAccumulator, init_map, add_cloud  # noqa: F401
from realsensetracker_tpu.tracking.trajectory import Trajectory  # noqa: F401
from realsensetracker_tpu.tracking.frame_to_frame import FrameToFrameTracker  # noqa: F401
from realsensetracker_tpu.tracking.keyframe import KeyframeTracker  # noqa: F401
from realsensetracker_tpu.tracking.frame_to_model import FrameToModelTracker  # noqa: F401
