"""BEV histogram metrics: JSD and RBF-kernel MMD.

Re-designs ``lidargen/metrics/bev.py:24-53`` plus the voxel-sum BEV grids of
``metric_utils.py:233-260`` (``pcd2bev_sum``): histogramming happens on-device
(`ops.bev.point_cloud_to_histogram` or `bev_occupancy_grid`), the divergences
are pure jnp.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from . import DATA_CONFIG, VOXEL_SIZE


def _kl(p, q, eps=1e-12):
    return jnp.sum(jnp.where(p > 0, p * (jnp.log(p + eps) - jnp.log(q + eps)), 0.0))


def jensen_shannon_distance(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """scipy.spatial.distance.jensenshannon semantics (sqrt of JS divergence,
    natural log), as used at ``bev.py:35-43``."""
    p = p / jnp.sum(p)
    q = q / jnp.sum(q)
    m = (p + q) / 2
    js = (_kl(p, m) + _kl(q, m)) / 2
    return jnp.sqrt(jnp.clip(js, min=0.0))


def cdist_rbf(p: jnp.ndarray, q: jnp.ndarray, sigma: float = 0.5) -> jnp.ndarray:
    """cf. ``bev.py:25-31``."""
    d2 = jnp.sum(p**2, 1)[:, None] + jnp.sum(q**2, 1)[None] - 2 * p @ q.T
    gamma = 1.0 / (2 * sigma**2)
    return jnp.exp(-gamma * jnp.clip(d2, min=0.0))


def compute_jsd_2d(hist1: jnp.ndarray, hist2: jnp.ndarray) -> float:
    """cf. ``bev.py:35-43``: pool histograms over samples, then JSD."""
    p = jnp.sum(hist1.reshape(hist1.shape[0], -1), axis=0)
    q = jnp.sum(hist2.reshape(hist2.shape[0], -1), axis=0)
    return float(jensen_shannon_distance(p, q))


def compute_mmd_2d(hist1: jnp.ndarray, hist2: jnp.ndarray) -> float:
    """cf. ``bev.py:46-53``: per-sample normalized hists, RBF-kernel MMD."""
    p = hist1.reshape(hist1.shape[0], -1)
    q = hist2.reshape(hist2.shape[0], -1)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    q = q / jnp.sum(q, axis=1, keepdims=True)
    mmd = (
        jnp.mean(cdist_rbf(p, p))
        + jnp.mean(cdist_rbf(q, q))
        - 2 * jnp.mean(cdist_rbf(p, q))
    )
    return float(mmd)


def bev_grid_shape(data_type: str, voxel_size: float = VOXEL_SIZE):
    cfg = DATA_CONFIG[data_type]
    x_range, y_range = cfg["x"], cfg["y"]
    shape = (
        math.ceil((x_range[1] - x_range[0]) / voxel_size),
        math.ceil((y_range[1] - y_range[0]) / voxel_size),
    )
    min_bound = (
        math.ceil(x_range[0] / voxel_size),
        math.ceil(y_range[0] / voxel_size),
    )
    return shape, min_bound, x_range, y_range


@partial(jax.jit, static_argnames=("data_type", "voxel_size", "binary"))
def bev_occupancy_grid(
    pcd: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    data_type: str = "32",
    voxel_size: float = VOXEL_SIZE,
    binary: bool = True,
) -> jnp.ndarray:
    """Voxel-unique BEV grid of one cloud; cf. ``pcd2bev_sum``
    (``metric_utils.py:233-260``): each occupied voxel contributes exactly 1
    (the reference dedupes voxels via ``sparse_quantize`` before summing).
    """
    (H, W), (minx, miny), x_range, y_range = bev_grid_shape(data_type, voxel_size)
    valid = (
        (pcd[:, 0] > x_range[0])
        & (pcd[:, 0] < x_range[1])
        & (pcd[:, 1] > y_range[0])
        & (pcd[:, 1] < y_range[1])
    )
    if mask is not None:
        valid &= mask
    vx = jnp.floor(pcd[:, 0] / voxel_size).astype(jnp.int32) - minx
    vy = jnp.floor(pcd[:, 1] / voxel_size).astype(jnp.int32) - miny
    vx = jnp.clip(vx, 0, H - 1)
    vy = jnp.clip(vy, 0, W - 1)
    flat = jnp.where(valid, vx * W + vy, H * W)
    grid = jax.ops.segment_max(
        valid.astype(jnp.float32), flat, num_segments=H * W + 1
    )[: H * W]
    grid = jnp.clip(grid, 0.0, 1.0)
    return grid.reshape(H, W)


def compute_jsd_bev(reference_clouds, sample_clouds, data_type: str = "32") -> float:
    """Scene-set JSD on summed occupancy grids; cf. ``eval_utils.compute_jsd``
    (:85-95): JSD between the normalized voxel-count distributions."""
    ref = sum(bev_occupancy_grid(jnp.asarray(p), data_type=data_type) for p in reference_clouds)
    gen = sum(bev_occupancy_grid(jnp.asarray(p), data_type=data_type) for p in sample_clouds)
    return float(jensen_shannon_distance(ref.reshape(-1), gen.reshape(-1)))
