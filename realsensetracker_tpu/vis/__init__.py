from realsensetracker_tpu.vis.render import (  # noqa: F401
    render_cloud_png,
    render_depth_png,
    render_matches_png,
    fpfh_pca_colors,
    export_ply,
    load_xyzrgb,
    save_xyzrgb,
)
