from .projection import (  # noqa: F401
    points_to_range_image,
    convert_points_to_2d,
    convert_boxes_to_2d,
    spherical_grid_coords,
)
from .points import (  # noqa: F401
    ball_query,
    farthest_point_sampling,
    gather_points,
    group_points,
    interpolation_weights,
    knn,
    points_in_boxes,
    query_and_group,
    three_interpolate,
    three_nn,
)
from .chamfer import chamfer_distance, chamfer_metric  # noqa: F401
from .bev import point_cloud_to_histogram  # noqa: F401
