"""LiDAR geometry utilities (depth codecs, ray angles, range→xyz).

TPU-native re-design of the reference's ``lidargen/utils/lidar.py`` (see
``lidargen/utils/lidar.py:9-132``): instead of an ``nn.Module`` with registered
buffers, :class:`LiDARUtility` is a frozen dataclass registered as a JAX pytree
whose methods are pure ``jnp`` functions, so every codec is jit-able and fuses
into the surrounding XLA graph.

Array convention: images are **NHWC** ``(B, H, W, C)`` (TPU-friendly layout);
ray angles are ``(H, W, 2)`` with channel 0 = elevation (phi) and channel
1 = azimuth (theta), in radians — channel order matches the reference's
``torch.stack([elevation, azimuth])``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

DepthFormat = Literal["log_depth", "inverse_depth", "depth"]


def get_linear_ray_angles_np(
    H: int = 64,
    W: int = 2048,
    fov_up: float = 10.0,
    fov_down: float = -30.0,
    dtype=np.float64,
) -> np.ndarray:
    """Host-side (numpy) linear ray angles, used for static coord encodings."""
    w_left, w_right = 180.0, -180.0
    elevation = 1.0 - np.arange(H, dtype=dtype) / H
    elevation = elevation * (fov_up - fov_down) + fov_down
    azimuth = 1.0 - np.arange(W, dtype=dtype) / W
    azimuth = azimuth * (w_left - w_right) + w_right
    elev, azim = np.meshgrid(elevation, azimuth, indexing="ij")
    angles = np.stack([elev, azim], axis=-1)
    return np.deg2rad(angles)


def get_linear_ray_angles(
    H: int = 64,
    W: int = 2048,
    fov_up: float = 10.0,
    fov_down: float = -30.0,
) -> jnp.ndarray:
    """Linear elevation/azimuth ray angles; cf. ``lidargen/utils/lidar.py:22-32``.

    Returns ``(H, W, 2)`` radians, channel 0 = elevation, channel 1 = azimuth.
    """
    return jnp.asarray(
        get_linear_ray_angles_np(H, W, fov_up, fov_down, dtype=np.float32)
    )


def get_hdl64e_linear_ray_angles(H: int = 64, W: int = 2048) -> jnp.ndarray:
    """HDL-64E ray angles (fov +3/−25°); cf. ``lidargen/utils/lidar.py:9-20``."""
    return get_linear_ray_angles(H, W, fov_up=3.0, fov_down=-25.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LiDARUtility:
    """Pure-functional equivalent of ``LiDARUtility`` (``lidargen/utils/lidar.py:34-132``).

    All methods accept/return NHWC arrays. ``ray_angles`` is a pytree leaf so the
    utility can be passed through ``jax.jit`` boundaries.
    """

    ray_angles: jnp.ndarray  # (H, W, 2) radians
    resolution: tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    depth_format: str = dataclasses.field(metadata=dict(static=True))
    min_depth: float = dataclasses.field(metadata=dict(static=True))
    max_depth: float = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        resolution: tuple[int, int],
        depth_format: DepthFormat,
        min_depth: float,
        max_depth: float,
        ray_angles: jnp.ndarray | None = None,
        fov_up: float = 10.0,
        fov_down: float = -30.0,
    ) -> "LiDARUtility":
        assert depth_format in ("log_depth", "inverse_depth", "depth")
        if ray_angles is None:
            ray_angles = get_linear_ray_angles(
                *resolution, fov_up=fov_up, fov_down=fov_down
            )
        assert ray_angles.ndim == 3 and ray_angles.shape[-1] == 2
        if tuple(ray_angles.shape[:2]) != tuple(resolution):
            ray_angles = nearest_interp_2d(ray_angles, resolution)
        return cls(
            ray_angles=ray_angles.astype(jnp.float32),
            resolution=tuple(resolution),
            depth_format=depth_format,
            min_depth=float(min_depth),
            max_depth=float(max_depth),
        )

    # ------------------------------------------------------------------ codecs

    @staticmethod
    def denormalize(x: jnp.ndarray) -> jnp.ndarray:
        """[-1, 1] → [0, 1]."""
        return (x + 1) / 2

    @staticmethod
    def normalize(x: jnp.ndarray) -> jnp.ndarray:
        """[0, 1] → [-1, 1]."""
        return x * 2 - 1

    def get_mask(self, metric: jnp.ndarray) -> jnp.ndarray:
        mask = (metric > self.min_depth) & (metric < self.max_depth)
        return mask.astype(metric.dtype)

    def convert_depth(
        self,
        metric: jnp.ndarray,
        mask: jnp.ndarray | None = None,
        depth_format: str | None = None,
    ) -> jnp.ndarray:
        """Metric depth [0, max_depth] → normalized [0, 1]; ``lidar.py:84-107``."""
        depth_format = depth_format or self.depth_format
        if mask is None:
            mask = self.get_mask(metric)
        if depth_format == "log_depth":
            normalized = jnp.log2(metric + 1) / math.log2(self.max_depth + 1)
        elif depth_format == "inverse_depth":
            normalized = self.min_depth / (metric + 1e-8)
        elif depth_format == "depth":
            normalized = metric / self.max_depth
        else:
            raise ValueError(depth_format)
        return jnp.clip(normalized, 0.0, 1.0) * mask

    def revert_depth(
        self, normalized: jnp.ndarray, image_format: str | None = None
    ) -> jnp.ndarray:
        """Normalized depth [0, 1] → metric [0, max_depth]; ``lidar.py:109-128``."""
        image_format = image_format or self.depth_format
        if image_format == "log_depth":
            metric = jnp.exp2(normalized * math.log2(self.max_depth + 1)) - 1
        elif image_format == "inverse_depth":
            metric = self.min_depth / (normalized + 1e-8)
        elif image_format == "depth":
            metric = normalized * self.max_depth
        else:
            raise ValueError(image_format)
        return metric * self.get_mask(metric)

    def to_xyz(self, metric: jnp.ndarray) -> jnp.ndarray:
        """Range image (B,H,W,1) → cartesian (B,H,W,3); ``lidar.py:71-82``."""
        assert metric.ndim == 4
        mask = ((metric > self.min_depth) & (metric < self.max_depth)).astype(
            metric.dtype
        )
        phi = self.ray_angles[None, ..., 0:1]
        theta = self.ray_angles[None, ..., 1:2]
        grid_x = metric * jnp.cos(phi) * jnp.cos(theta)
        grid_y = metric * jnp.cos(phi) * jnp.sin(theta)
        grid_z = metric * jnp.sin(phi)
        xyz = jnp.concatenate([grid_x, grid_y, grid_z], axis=-1)
        return xyz * mask


def nearest_interp_2d(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """'nearest-exact' resize over the first two dims of an (H, W, C) array.

    Matches ``F.interpolate(..., mode="nearest-exact")`` used at
    ``lidargen/utils/lidar.py:54-58``: index = floor((i + 0.5) * scale).
    """
    H, W = x.shape[:2]
    out_h, out_w = size
    rows = np.floor((np.arange(out_h) + 0.5) * (H / out_h)).astype(np.int32)
    cols = np.floor((np.arange(out_w) + 0.5) * (W / out_w)).astype(np.int32)
    rows = np.clip(rows, 0, H - 1)
    cols = np.clip(cols, 0, W - 1)
    return x[rows][:, cols]
