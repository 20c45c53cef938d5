from .metrics import (
    psnr,
    chamfer_distance,
    f_score,
    normal_consistency,
    sample_mesh_surface,
    mesh_metrics_3d,
)
