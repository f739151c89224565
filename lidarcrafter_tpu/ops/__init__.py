from .projection import (  # noqa: F401
    points_to_range_image,
    convert_points_to_2d,
    convert_boxes_to_2d,
    spherical_grid_coords,
)
