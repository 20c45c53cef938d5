from .embedder import positional_encoding, pe_dim
from .density import laplace_density, get_beta
from .render import volume_rendering_weights, render_ray_outputs
from .scale_shift import compute_scale_and_shift_1d, compute_scale_and_shift_2d
from .geometry import (
    lift,
    get_camera_params,
    get_sphere_intersections,
    near_far_from_cube,
    load_K_Rt_from_P,
    quat_to_rot,
    rot_to_quat,
)
from .sampler import SamplerConfig, uniform_z_vals, error_bound_z_vals
from .chunking import chunked_apply
