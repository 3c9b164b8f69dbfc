from .renderer import (
    SimpleRender,
    PCMLRender,
    get_projection_matrix,
    get_rasterize_param_from_camera,
    pcgc_rescale,
    generate_cam,
    load_pcml,
)


def _get_pallas_raster():
    from ..ops.rasterize_pallas import rasterize_gaussians_pallas

    return rasterize_gaussians_pallas
