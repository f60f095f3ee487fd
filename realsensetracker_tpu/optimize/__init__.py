from realsensetracker_tpu.optimize.pose_graph import (  # noqa: F401
    PoseGraph,
    optimize_pose_graph,
)
