"""RoI-aware 3D pooling: per-box voxel grids of point features.

Re-designs ``lidargen/ops/roiaware_pool3d`` (``roiaware_pool3d_utils.py:44-105``
+ ``src/roiaware_pool3d_kernel.cu``): points inside each rotated box are
binned into an (out_x, out_y, out_z) local voxel grid and max- or avg-pooled —
here via masked ``segment_max``/``segment_sum`` over static shapes instead of
atomics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .points import _points_in_boxes_single


@partial(jax.jit, static_argnames=("out_size", "pool_method"))
def roiaware_pool3d(
    rois: jnp.ndarray,
    pts: jnp.ndarray,
    pts_feature: jnp.ndarray,
    out_size: int | tuple[int, int, int] = 7,
    pool_method: str = "max",
    pts_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(N, 7) rois × (P, 3) pts × (P, C) feats → (N, ox, oy, oz, C).

    Voxel assignment mirrors ``roiaware_pool3d_kernel.cu:56-74``: local box
    frame, uniform bins, clamped indices; empty voxels are zero.
    """
    if isinstance(out_size, int):
        ox = oy = oz = out_size
    else:
        ox, oy, oz = out_size
    N = rois.shape[0]
    P = pts.shape[0]
    if pts_mask is None:
        pts_mask = jnp.ones((P,), bool)

    member = _points_in_boxes_single(pts, rois) & pts_mask[None, :]  # (N, P)

    # local coordinates per box
    shift = pts[None, :, :] - rois[:, None, :3]
    rz = rois[:, 6]
    c, s = jnp.cos(-rz)[:, None], jnp.sin(-rz)[:, None]
    lx = shift[..., 0] * c - shift[..., 1] * s
    ly = shift[..., 0] * s + shift[..., 1] * c
    lz = shift[..., 2]
    dx, dy, dz = rois[:, None, 3], rois[:, None, 4], rois[:, None, 5]
    xi = jnp.clip(((lx + dx / 2) / (dx / ox)).astype(jnp.int32), 0, ox - 1)
    yi = jnp.clip(((ly + dy / 2) / (dy / oy)).astype(jnp.int32), 0, oy - 1)
    zi = jnp.clip(((lz + dz / 2) / (dz / oz)).astype(jnp.int32), 0, oz - 1)
    voxel = (xi * oy + yi) * oz + zi  # (N, P)
    V = ox * oy * oz
    seg = jnp.where(member, voxel, V)

    def pool_one(seg_k):
        if pool_method == "max":
            pooled = jax.ops.segment_max(
                jnp.where(seg_k[:, None] < V, pts_feature, -jnp.inf),
                seg_k,
                num_segments=V + 1,
            )[:V]
            return jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        pooled = jax.ops.segment_sum(
            jnp.where(seg_k[:, None] < V, pts_feature, 0.0), seg_k, num_segments=V + 1
        )[:V]
        counts = jax.ops.segment_sum(
            (seg_k < V).astype(pts_feature.dtype), seg_k, num_segments=V + 1
        )[:V]
        return pooled / jnp.maximum(counts, 1.0)[:, None]

    pooled = jax.vmap(pool_one)(seg)  # (N, V, C)
    return pooled.reshape(N, ox, oy, oz, pts_feature.shape[-1])
