"""Model/engine factory mirroring ``lidargen/utils/inference.py:261-344``.

``build_diffusion_training(cfg)`` returns ``(model, engine, lidar_utils)`` for
a named config: the flax denoiser, a :class:`ContinuousDiffusion` engine whose
``apply_fn`` wraps ``model.apply``, and the LiDAR utility.
"""

from __future__ import annotations

from typing import Any

from ..diffusion import ContinuousDiffusion
from ..models import build_model
from ..utils.lidar import LiDARUtility


def _in_channels(cfg) -> int:
    ch = int(cfg.data.train_depth) + int(cfg.data.train_reflectance)
    if hasattr(cfg, "condition_model") and getattr(cfg.diffusion, "cond_mode", None) == "concat":
        ch += cfg.condition_model.params["out_channels"]
    return ch


def build_diffusion_training(cfg) -> tuple[Any, ContinuousDiffusion, LiDARUtility]:
    in_channels = _in_channels(cfg)
    resolution = tuple(cfg.data.resolution)

    model = build_model(
        cfg.model.architecture,
        in_channels=in_channels,
        resolution=resolution,
        # "spherical" projections use linear ray angles as the coords buffer
        # (inference.py:281-282); "unfolding" would need precomputed angles.
        use_ray_angle_coords="spherical" in cfg.data.projection,
        fov_up=cfg.data.fov_up,
        fov_down=cfg.data.fov_down,
        **cfg.model.params,
    )

    assert cfg.diffusion.timestep_type == "continuous", "discrete engine lands with DiscreteDiffusion"

    def apply_fn(params, x_t, log_snr, **kw):
        return model.apply(params, x_t, log_snr, **kw)

    engine = ContinuousDiffusion(
        apply_fn=apply_fn,
        sampling_shape=(*resolution, in_channels),
        prediction_type=cfg.diffusion.prediction_type,
        loss_type=cfg.diffusion.loss_type,
        noise_schedule=cfg.diffusion.noise_schedule,
    )

    lidar_utils = LiDARUtility.create(
        resolution=resolution,
        depth_format=cfg.data.depth_format,
        min_depth=cfg.data.min_depth,
        max_depth=cfg.data.max_depth,
        fov_up=cfg.data.fov_up,
        fov_down=cfg.data.fov_down,
    )
    return model, engine, lidar_utils
