from . import lidar  # noqa: F401
