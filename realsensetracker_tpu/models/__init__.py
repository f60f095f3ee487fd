"""Pipeline presets ("model zoo"): named, configured registration pipelines.

| name              | pipeline                                   | reference analog |
|-------------------|--------------------------------------------|------------------|
| projective-icp    | pyramid + projective point-to-plane GN     | north-star rebuild of the ICP stack |
| keyframe          | projective ICP against held keyframes      | disabled frame-to-model branch, rs_replay_app.cpp:274-287 |
| gnc-icp           | brute-force 1-NN GNC-weighted SVD ICP      | AlignIcp3d, align_icp.cpp:73-167 |
| gicp              | whitened plane-to-plane Gauss-Newton       | ComputeAlignment, align_gicp.cpp |
| fpfh-kabsch-icp   | FPFH match + Lowe + weighted Kabsch + ICP  | rs_align_app pipeline, rs_align_app.cpp:272-308 |
| robust-global     | GNC-TLS global registration                | RegisterTeaser, teaser_interface.cpp |
"""

from realsensetracker_tpu.models.pairwise import align_pair, AlignPairResult  # noqa: F401
from realsensetracker_tpu.models.registry import get_pipeline, list_pipelines  # noqa: F401
