from .renderer import (
    SimpleRender,
    PCMLRender,
    get_projection_matrix,
    get_rasterize_param_from_camera,
    pcgc_rescale,
    generate_cam,
    load_pcml,
)
