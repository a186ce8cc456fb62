from atvsnet_tpu.geometry.cameras import split_cam, depth_range_from_cams  # noqa: F401
from atvsnet_tpu.geometry.homography import (  # noqa: F401
    get_homographies,
    pixel_grid,
)
from atvsnet_tpu.geometry.warp import (  # noqa: F401
    interpolate,
    homography_warp,
    plane_sweep_warp,
    warp_by_depth,
    transform_depth,
)
from atvsnet_tpu.geometry.visual_hull import get_visual_hull  # noqa: F401
from atvsnet_tpu.geometry.depth_regression import (  # noqa: F401
    prob2depth,
    prob2depth_upsample,
    probability_map,
    upsample_prob_vol,
)
