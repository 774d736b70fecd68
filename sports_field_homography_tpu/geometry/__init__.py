from .homography import (
    inverse_3x3,
    transform_points,
    transform_poi,
    normalize_points,
    denormalize_points,
    rescale_theta,
)
from .warp import normalized_grid, warp_grid, grid_sample, warp_homography
from .court import (
    Warper,
    CourtSizes,
    CourtMapping,
    FrameMapping,
    load_court_mask,
    load_court_poi,
    generate_uv_template,
    transform_poi_np,
    map_frame_to_court,
    map_court_to_frame,
)
