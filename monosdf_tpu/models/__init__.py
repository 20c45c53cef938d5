from .fields import (
    ImplicitNetConfig,
    RenderingNetConfig,
    init_implicit_net,
    init_rendering_net,
    implicit_apply,
    sdf_value,
    sdf_feat_grad,
    sdf_gradient,
    rendering_apply,
)
from .monosdf import MonoSDFConfig, init_monosdf, render_rays, rays_from_camera
