from gsworld_tpu.render.camera import (  # noqa: F401
    GSCamera,
    RasterConfig,
    cam_maniskill2gs,
    camera_from_opencv,
    make_camera,
    projection_matrix,
)
from gsworld_tpu.render.project import Projected, project_gaussians  # noqa: F401
from gsworld_tpu.render.binning import TileBins, bin_gaussians  # noqa: F401
from gsworld_tpu.render.rasterize import (  # noqa: F401
    composite_tiles,
    render,
    render_uint8,
)
