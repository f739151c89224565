"""Spherical range-image projection (point cloud → H×W image) and box rasterization.

TPU-native re-design of the reference's host-side numpy projection
(``lidargen/dataset/transforms_3d/common.py:26-91``): the reference sorts points
by descending depth and scatters with numpy "last write wins" so the *closest*
point claims each pixel.  Here the same winner is selected with a deterministic
rank-based ``segment_min`` — fully jit-able, fixed-shape (padded points carry a
validity mask), and batchable with ``vmap``.

Also implements ``convert_points_to_2d`` / ``convert_boxes_to_2d``
(``common.py:99-216``) with static box counts and mask-based rasterization in
place of the reference's data-dependent integer slicing, so the layout
conditioning masks can be built on-device inside a jitted pipeline.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def spherical_grid_coords(
    xyz: jnp.ndarray,
    H: int,
    W: int,
    fov_up: float = 10.0,
    fov_down: float = -30.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point integer grid coords (grid_h, grid_w) and depth.

    Mirrors ``common.py:74-82`` (spherical branch).  ``xyz``: (N, 3).
    """
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    depth = jnp.linalg.norm(xyz, axis=1)
    h_up, h_down = math.radians(fov_up), math.radians(fov_down)
    elevation = jnp.arcsin(z / (depth + 1e-6)) + abs(h_down)
    grid_h = 1.0 - elevation / (h_up - h_down)
    grid_h = jnp.clip(jnp.floor(grid_h * H), 0, H - 1).astype(jnp.int32)
    azimuth = -jnp.arctan2(y, x)
    grid_w = ((azimuth / jnp.pi + 1) / 2) % 1
    grid_w = jnp.clip(jnp.floor(grid_w * W), 0, W - 1).astype(jnp.int32)
    return grid_h, grid_w, depth


@partial(jax.jit, static_argnames=("H", "W", "min_depth", "max_depth", "fov_up", "fov_down"))
def points_to_range_image(
    points: jnp.ndarray,
    point_mask: jnp.ndarray | None = None,
    *,
    H: int = 32,
    W: int = 1024,
    min_depth: float = 1.45,
    max_depth: float = 80.0,
    fov_up: float = 10.0,
    fov_down: float = -30.0,
) -> jnp.ndarray:
    """Project a (possibly padded) point cloud to an (H, W, C+2) range image.

    ``points``: (N, C) with columns [x, y, z, feat...]; ``point_mask``: (N,) bool
    marking real (non-padding) points.  Output channels are
    ``[x, y, z, feat..., depth, valid]`` exactly as ``common.py:48,88-91``.

    Winner per pixel = the real point with the smallest depth; ties broken by
    point order (stable).  The reference scatters *all* points (also
    out-of-depth-range ones) and only records validity in the last channel —
    reproduced here.
    """
    N = points.shape[0]
    if point_mask is None:
        point_mask = jnp.ones((N,), dtype=bool)

    grid_h, grid_w, depth = spherical_grid_coords(
        points[:, :3], H, W, fov_up=fov_up, fov_down=fov_down
    )
    in_range = (depth >= min_depth) & (depth <= max_depth)

    # Pixel id; padded points routed to a trash segment HW.
    pixel = jnp.where(point_mask, grid_h * W + grid_w, H * W)

    # Winner = min-depth point per pixel, ties to the smallest point index.
    # One stable two-key sort (pixel major, depth minor) puts each pixel's
    # winner at the start of its run; a run-start mask then scatters winners
    # to UNIQUE pixel slots (non-winners routed out-of-bounds and dropped),
    # so XLA takes the fast unique-scatter path.  On-chip at the rollout
    # shape (8×39k pts): 2.0 ms vs 6.8 ms for the segment_min(scatter-min)
    # formulation and 6.4 ms for the round-4 double-argsort — TPU sorts are
    # cheap, arbitrary scatters are not.
    idx = jnp.arange(N, dtype=jnp.int32)
    pix_s, _, idx_s = jax.lax.sort((pixel, depth, idx), num_keys=2, is_stable=True)
    run_start = jnp.concatenate([jnp.array([True]), pix_s[1:] != pix_s[:-1]])
    # non-winners get DISTINCT out-of-bounds slots (H*W + position) so the
    # unique_indices promise is genuinely true — not merely true after the
    # drop — keeping the scatter's fast path well-defined
    scatter_ix = jnp.where(run_start & (pix_s < H * W), pix_s, H * W + idx)
    winner_idx = (
        jnp.full((H * W,), N, jnp.int32)
        .at[scatter_ix]
        .set(idx_s, mode="drop", unique_indices=True)
    )
    hit = winner_idx < N  # empty pixels keep the fill value
    winner_idx = jnp.clip(winner_idx, 0, N - 1)

    feats = jnp.concatenate(
        [
            points,
            depth[:, None],
            in_range[:, None].astype(points.dtype),
        ],
        axis=1,
    )
    image = feats[winner_idx] * hit[:, None].astype(points.dtype)
    return image.reshape(H, W, feats.shape[1])


def convert_points_to_2d(
    points: jnp.ndarray,
    H: int = 32,
    W: int = 1024,
    fov_up: float = 10.0,
    fov_down: float = -30.0,
) -> jnp.ndarray:
    """Normalized (grid_w, grid_h) image coords per point; ``common.py:184-216``."""
    xyz = points[:, :3]
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    depth = jnp.linalg.norm(xyz, axis=1) + 1e-6
    h_up, h_down = math.radians(fov_up), math.radians(fov_down)
    elevation = jnp.arcsin(z / depth) + abs(h_down)
    grid_h = 1.0 - elevation / (h_up - h_down)
    grid_h = jnp.clip(jnp.floor(grid_h * H), 0, H - 1) / H
    azimuth = -jnp.arctan2(y, x)
    grid_w = ((azimuth / jnp.pi + 1) / 2) % 1
    grid_w = jnp.clip(jnp.floor(grid_w * W), 0, W - 1) / W
    return jnp.stack([grid_w, grid_h], axis=1)


def box_corners_3d(boxes_3d: jnp.ndarray) -> jnp.ndarray:
    """(N, ≥7) boxes [x,y,z,l,w,h,yaw,...] → (N, 8, 3) corners; ``common.py:111-131``."""
    l, w, h = boxes_3d[:, 3], boxes_3d[:, 4], boxes_3d[:, 5]
    sx = jnp.array([0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5])
    sy = jnp.array([0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5, 0.5])
    sz = jnp.array([0.5, 0.5, 0.5, 0.5, -0.5, -0.5, -0.5, -0.5])
    corners = jnp.stack(
        [l[:, None] * sx[None], w[:, None] * sy[None], h[:, None] * sz[None]],
        axis=1,
    )  # (N, 3, 8)
    yaw = boxes_3d[:, 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack(
        [
            jnp.stack([c, -s, zeros], axis=-1),
            jnp.stack([s, c, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=1,
    )  # (N, 3, 3)
    corners = rot @ corners + boxes_3d[:, :3][:, :, None]
    return jnp.transpose(corners, (0, 2, 1))  # (N, 8, 3)


@partial(jax.jit, static_argnames=("H", "W", "fov_up", "fov_down"))
def convert_boxes_to_2d(
    boxes_3d: jnp.ndarray,
    box_mask: jnp.ndarray | None = None,
    *,
    H: int = 32,
    W: int = 1024,
    fov_up: float = 10.0,
    fov_down: float = -30.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rasterize 3D boxes into layout conditioning masks; ``common.py:99-181``.

    ``boxes_3d``: (N, ≥8) with [x, y, z, l, w, h, yaw, class].  N is static
    (the reference pads scenes to 13 boxes, ``nuscenes_dataset.py:175-192``).

    Returns ``(corners_2d (N,4), condition_mask (H,W,2), scene_loss_weight_map (H,W))``.
    Channel 0 of ``condition_mask`` holds the class value, channel 1 the box
    center depth.  The reference writes boxes sequentially (later boxes
    overwrite); reproduced with a static unrolled overwrite loop.
    """
    N = boxes_3d.shape[0]
    if box_mask is None:
        box_mask = jnp.ones((N,), dtype=bool)

    c_depth = jnp.linalg.norm(boxes_3d[:, :3], axis=1) + 1e-6
    corners = box_corners_3d(boxes_3d).reshape(-1, 3)
    grid = convert_points_to_2d(corners, H=H, W=W, fov_up=fov_up, fov_down=fov_down)
    grid = grid.reshape(N, 8, 2)
    x1 = jnp.min(grid[..., 0], axis=1)
    y1 = jnp.min(grid[..., 1], axis=1)
    x2 = jnp.max(grid[..., 0], axis=1)
    y2 = jnp.max(grid[..., 1], axis=1)
    corners_2d = jnp.stack([x1, y1, x2, y2], axis=1)

    xi1 = (x1 * W).astype(jnp.int32)
    xi2 = (x2 * W).astype(jnp.int32)
    yi1 = (y1 * H).astype(jnp.int32)
    yi2 = (y2 * H).astype(jnp.int32)
    wrap = (xi2 - xi1) / W > 0.6  # box straddles the azimuth seam

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def box_region(i):
        in_rows = (rows >= yi1[i]) & (rows < yi2[i])
        inside = (cols >= xi1[i]) & (cols < xi2[i])
        outside = (cols < xi1[i]) | (cols >= xi2[i])
        region = in_rows & jnp.where(wrap[i], outside, inside)
        return region & box_mask[i]

    regions = jax.vmap(box_region)(jnp.arange(N))  # (N, H, W)

    # area per box (matches the int-grid arithmetic of common.py:160,171)
    area_in = (xi2 - xi1) * (yi2 - yi1)
    area_wrap = (W - xi2 + xi1) * (yi2 - yi1)
    areas = jnp.where(wrap, area_wrap, area_in).astype(jnp.float32)
    areas = areas * box_mask

    # sequential overwrite: later boxes win
    sem = jnp.zeros((H, W), dtype=jnp.float32)
    dep = jnp.zeros((H, W), dtype=jnp.float32)
    for i in range(N):
        sem = jnp.where(regions[i], boxes_3d[i, 7], sem)
        dep = jnp.where(regions[i], c_depth[i], dep)
    condition_mask = jnp.stack([sem, dep], axis=-1)

    max_area = jnp.maximum(jnp.max(areas), 1e-6)
    weights = (3.0 - areas / max_area) * box_mask  # (N,)
    weight_map = jnp.einsum("nhw,n->hw", regions.astype(jnp.float32), weights)
    scene_loss_weight_map = jnp.exp(weight_map)

    return corners_2d, condition_mask, scene_loss_weight_map
