"""Rotated BEV/3D box IoU + NMS as fixed-shape jitted lax code.

TPU-native re-design of ``lidargen/ops/iou3d_nms`` (``iou3d_nms_utils.py:31-171``
and the 6 CUDA kernels in ``src/iou3d_nms_kernel.cu``): the branchy
polygon-clipping geometry becomes a masked fixed-iteration Sutherland–Hodgman
over (≤8)-vertex buffers, vectorised over box pairs with ``vmap``; NMS is a
greedy suppression scan returning a fixed-size keep mask.

Boxes are (N, 7) [x, y, z, dx, dy, dz, heading], z-centered (OpenPCDet
convention, same as ``points_in_boxes``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_MAXV = 8  # rect ∩ rect has at most 8 vertices


def box_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) → (N, 4, 2) CCW corners in the BEV plane."""
    x, y = boxes[:, 0], boxes[:, 1]
    dx, dy = boxes[:, 3], boxes[:, 4]
    rz = boxes[:, 6]
    sx = jnp.array([0.5, -0.5, -0.5, 0.5])
    sy = jnp.array([0.5, 0.5, -0.5, -0.5])
    cx = dx[:, None] * sx[None]
    cy = dy[:, None] * sy[None]
    c, s = jnp.cos(rz)[:, None], jnp.sin(rz)[:, None]
    rx = cx * c - cy * s + x[:, None]
    ry = cx * s + cy * c + y[:, None]
    return jnp.stack([rx, ry], axis=-1)


def _clip_by_halfplane(poly, count, a, b):
    """Clip a convex polygon (poly (MAXV,2), count) by the half-plane left of
    edge a→b.  Returns (new_poly, new_count)."""
    idx = jnp.arange(_MAXV)
    nxt_idx = jnp.where(idx + 1 < count, idx + 1, 0)
    cur = poly
    nxt = poly[nxt_idx]
    edge = b - a

    def side(p):
        return edge[0] * (p[..., 1] - a[1]) - edge[1] * (p[..., 0] - a[0])

    s_cur = side(cur)
    s_nxt = side(nxt)
    cur_in = s_cur >= 0
    nxt_in = s_nxt >= 0
    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = cur + t[:, None] * (nxt - cur)

    valid_edge = idx < count
    # Sutherland–Hodgman emissions per directed edge (cur → nxt):
    #   nxt inside, cur outside → [inter, nxt]
    #   nxt inside, cur inside  → [nxt]
    #   nxt outside, cur inside → [inter]
    emit1 = valid_edge & ((nxt_in & ~cur_in) | (~nxt_in & cur_in))  # inter
    emit1_val = inter
    emit2 = valid_edge & nxt_in  # nxt
    emit2_val = nxt
    counts = emit1.astype(jnp.int32) + emit2.astype(jnp.int32)
    base = jnp.cumsum(counts) - counts

    pos1 = jnp.where(emit1, base, _MAXV)
    pos2 = jnp.where(emit2, base + emit1.astype(jnp.int32), _MAXV)
    out = jnp.zeros((_MAXV, 2), poly.dtype)
    out = out.at[pos1].set(emit1_val, mode="drop")
    out = out.at[pos2].set(emit2_val, mode="drop")
    return out, jnp.sum(counts)


def _polygon_area(poly, count):
    """Shoelace over the first ``count`` vertices."""
    idx = jnp.arange(_MAXV)
    nxt_idx = jnp.where(idx + 1 < count, idx + 1, 0)
    nxt = poly[nxt_idx]
    valid = idx < count
    cross = poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0)))


def _pair_overlap_bev(corners_a, corners_b):
    """Intersection area of two BEV rectangles given (4, 2) corners each."""
    poly = jnp.zeros((_MAXV, 2), corners_a.dtype).at[:4].set(corners_a)
    count = jnp.int32(4)
    for i in range(4):
        a = corners_b[i]
        b = corners_b[(i + 1) % 4]
        poly, count = _clip_by_halfplane(poly, count, a, b)
    return _polygon_area(poly, count)


@jax.jit
def boxes_overlap_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) × (M, 7) → (N, M) BEV intersection areas."""
    ca = box_corners_bev(boxes_a)
    cb = box_corners_bev(boxes_b)
    return jax.vmap(lambda a: jax.vmap(lambda b: _pair_overlap_bev(a, b))(cb))(ca)


@jax.jit
def boxes_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """cf. ``iou3d_nms_utils.boxes_iou_bev`` (:31-44)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, min=1e-6)


def _height_overlap(boxes_a, boxes_b):
    a_max = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    a_min = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    b_max = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    b_min = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    return jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), min=0)


@jax.jit
def boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """cf. ``iou3d_nms_utils.boxes_iou3d_gpu`` (:48-81)."""
    overlap_3d = boxes_overlap_bev(boxes_a, boxes_b) * _height_overlap(boxes_a, boxes_b)
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, min=1e-6)


@jax.jit
def paired_boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise IoU3D of aligned box pairs; cf. ``paired_boxes_iou3d_gpu`` (:155-171)."""
    ca = box_corners_bev(boxes_a)
    cb = box_corners_bev(boxes_b)
    overlap_bev = jax.vmap(_pair_overlap_bev)(ca, cb)
    a_max = boxes_a[:, 2] + boxes_a[:, 5] / 2
    a_min = boxes_a[:, 2] - boxes_a[:, 5] / 2
    b_max = boxes_b[:, 2] + boxes_b[:, 5] / 2
    b_min = boxes_b[:, 2] - boxes_b[:, 5] / 2
    oh = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), min=0)
    o3d = overlap_bev * oh
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return o3d / jnp.clip(vol_a + vol_b - o3d, min=1e-6)


def iou_bev_axis_aligned(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Rotation-ignoring BEV IoU (``iou3d_nms_kernel.cu`` iou_normal)."""
    ax1 = boxes_a[:, 0] - boxes_a[:, 3] / 2
    ax2 = boxes_a[:, 0] + boxes_a[:, 3] / 2
    ay1 = boxes_a[:, 1] - boxes_a[:, 4] / 2
    ay2 = boxes_a[:, 1] + boxes_a[:, 4] / 2
    bx1 = boxes_b[:, 0] - boxes_b[:, 3] / 2
    bx2 = boxes_b[:, 0] + boxes_b[:, 3] / 2
    by1 = boxes_b[:, 1] - boxes_b[:, 4] / 2
    by2 = boxes_b[:, 1] + boxes_b[:, 4] / 2
    iw = jnp.clip(
        jnp.minimum(ax2[:, None], bx2[None]) - jnp.maximum(ax1[:, None], bx1[None]),
        min=0,
    )
    ih = jnp.clip(
        jnp.minimum(ay2[:, None], by2[None]) - jnp.maximum(ay1[:, None], by1[None]),
        min=0,
    )
    inter = iw * ih
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None]
    return inter / jnp.clip(area_a + area_b - inter, min=1e-6)


@partial(jax.jit, static_argnames=("normal",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    thresh: float,
    box_mask: jnp.ndarray | None = None,
    normal: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy rotated NMS; cf. ``nms_gpu`` (:120-136) / ``nms_normal_gpu`` (:138-152).

    Returns ``(order, keep_mask)``: box indices sorted by descending score and
    a same-length boolean keep mask (fixed-shape TPU formulation of the
    reference's variable-length index list; ``order[keep_mask]`` host-side
    reproduces the CUDA output order).
    """
    N = boxes.shape[0]
    if box_mask is None:
        box_mask = jnp.ones((N,), bool)
    order = jnp.argsort(-jnp.where(box_mask, scores, -jnp.inf))
    sorted_boxes = boxes[order]
    sorted_mask = box_mask[order]
    iou_fn = iou_bev_axis_aligned if normal else boxes_iou_bev
    iou = iou_fn(sorted_boxes, sorted_boxes)

    def body(i, state):
        keep, suppressed = state
        is_kept = sorted_mask[i] & ~suppressed[i]
        keep = keep.at[i].set(is_kept)
        suppressed = suppressed | (is_kept & (iou[i] > thresh) & (jnp.arange(N) > i))
        return keep, suppressed

    keep, _ = jax.lax.fori_loop(
        0, N, body, (jnp.zeros((N,), bool), jnp.zeros((N,), bool))
    )
    return order, keep
