"""Native 3D object detector (VoxelRCNN-style, anchor head) for the DCF
metric's foreground extraction.

The reference runs an external OpenPCDet VoxelRCNN (``build_network`` in
``lidargen/metrics/fg_object.py:23-26``, driven by
``tools/evaluation/extract_foreground_samples.py``) — the detector itself is
not vendored.  This module provides the TPU-native equivalent pipeline on our
own primitives: mean-VFE voxelization + submanifold/strided sparse convs
(``ops/sparse.py``) → height compression to BEV → conv BEV backbone →
single-stage anchor head (cls/box/dir) with SECOND-style box decoding and
rotated NMS (``ops/iou3d.py``).

Eval-mode (frozen BN); weight ingestion from pcdet checkpoints can map onto
the same (k^3, Cin, Cout) sparse kernels used by the eval backbones.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.iou3d import nms
from ...ops.sparse import voxelize
from ..extractor.pointnet import FrozenBN
from ..extractor.sparse_unet import SparseConvBlock, SubMConv3

_KINIT = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")


class SparseDetBackbone(nn.Module):
    """Stem + 3 stride-2 stages (VoxelBackBone8x shape); returns the deepest
    sparse level (coords at 1/8 resolution)."""

    channels: Sequence[int] = (16, 32, 64, 128)

    @nn.compact
    def __call__(self, feats, coords, mask):
        c = self.channels
        f = nn.relu(FrozenBN(name="stem_bn")(
            SubMConv3(c[0], name="stem")(feats, coords, mask)))
        f = jnp.where(mask[:, None], f, 0.0)
        cc, mm = coords, mask
        for k in range(1, 4):
            f, cc, mm = SparseConvBlock(c[k], name=f"down{k}")(f, cc, mm)
            g = SubMConv3(c[k], name=f"stage{k}_conv")(f, cc, mm)
            f = jnp.where(mm[:, None], nn.relu(FrozenBN(name=f"stage{k}_bn")(g)), 0.0)
        return f, cc, mm


class BEVBackbone(nn.Module):
    """Two conv blocks + upsampled concat (BaseBEVBackbone shape)."""

    channels: int = 128

    @nn.compact
    def __call__(self, x):
        c = self.channels

        def block(h, ch, stride, n, tag):
            h = nn.Conv(ch, (3, 3), strides=(stride, stride), padding="SAME",
                        use_bias=False, kernel_init=_KINIT, name=f"{tag}_conv0")(h)
            h = nn.relu(FrozenBN(name=f"{tag}_bn0")(h))
            for i in range(n):
                h = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                            kernel_init=_KINIT, name=f"{tag}_conv{i + 1}")(h)
                h = nn.relu(FrozenBN(name=f"{tag}_bn{i + 1}")(h))
            return h

        b1 = block(x, c, 1, 2, "b1")
        b2 = block(b1, 2 * c, 2, 2, "b2")
        up2 = nn.ConvTranspose(c, (2, 2), strides=(2, 2), use_bias=False,
                               kernel_init=_KINIT, name="up2")(b2)
        up2 = nn.relu(FrozenBN(name="up2_bn")(up2))
        # odd BEV sizes: the 2x transpose overshoots by one row/col
        up2 = up2[:, : b1.shape[1], : b1.shape[2]]
        return jnp.concatenate([b1, up2], axis=-1)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """SECOND/pcdet ``ResidualCoder.decode_torch`` residual decoding:
    (..., 7) deltas × (..., 7) anchors → boxes.  The anchor z is lifted to the
    box top-center frame (``za + dza/2``) and shifted back by the decoded
    height (``zg − dzg/2``), exactly like pcdet's coder."""
    xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
    la, wa, ha = anchors[..., 3], anchors[..., 4], anchors[..., 5]
    ra = anchors[..., 6]
    diag = jnp.sqrt(la**2 + wa**2)
    x = deltas[..., 0] * diag + xa
    y = deltas[..., 1] * diag + ya
    l = jnp.exp(deltas[..., 3]) * la
    w = jnp.exp(deltas[..., 4]) * wa
    h = jnp.exp(deltas[..., 5]) * ha
    z = deltas[..., 2] * ha + (za + ha / 2) - h / 2
    r = deltas[..., 6] + ra
    return jnp.stack([x, y, z, l, w, h, r], axis=-1)


class VoxelDetector(nn.Module):
    """Single-cloud anchor-based detector.

    ``__call__(points (N, 3+), point_mask)`` → dict with per-anchor decoded
    ``boxes`` (A, 7), ``scores`` (A, num_classes) sigmoid, ``dir_logits``;
    :meth:`predict` adds score thresholding + rotated BEV NMS.
    """

    point_range: Sequence[float] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    voxel_size: float = 0.3
    max_voxels: int = 16384
    num_classes: int = 4
    anchor_sizes: Sequence[Sequence[float]] = (
        (4.6, 1.95, 1.72),   # car
        (6.9, 2.5, 2.8),     # truck
        (11.0, 2.9, 3.5),    # bus
        (0.7, 0.7, 1.7),     # pedestrian
    )
    anchor_rotations: Sequence[float] = (0.0, 1.5707963)

    @property
    def bev_shape(self):
        pr = self.point_range
        nx = int(round((pr[3] - pr[0]) / self.voxel_size))
        ny = int(round((pr[4] - pr[1]) / self.voxel_size))
        return ny // 8, nx // 8  # deepest sparse level

    def anchors(self) -> np.ndarray:
        """(H, W, R*C, 7) anchor grid at the BEV resolution."""
        Hb, Wb = self.bev_shape
        pr = self.point_range
        ys = pr[1] + (np.arange(Hb) + 0.5) * (pr[4] - pr[1]) / Hb
        xs = pr[0] + (np.arange(Wb) + 0.5) * (pr[3] - pr[0]) / Wb
        out = []
        for rot in self.anchor_rotations:
            for size in self.anchor_sizes:
                a = np.zeros((Hb, Wb, 7), np.float32)
                a[..., 0] = xs[None, :]
                a[..., 1] = ys[:, None]
                a[..., 2] = -1.0
                a[..., 3:6] = size
                a[..., 6] = rot
                out.append(a)
        return np.stack(out, axis=2).reshape(Hb, Wb, -1, 7)

    @nn.compact
    def __call__(self, points, point_mask):
        pr = self.point_range
        inr = (
            point_mask
            & jnp.all(points[:, :3] >= jnp.asarray(pr[:3]), -1)
            & jnp.all(points[:, :3] < jnp.asarray(pr[3:]) - 1e-3, -1)
        )
        shifted = points[:, :3] - jnp.asarray(pr[:3])
        coords, src, vmask, _ = voxelize(
            shifted, self.voxel_size, point_mask=inr, max_voxels=self.max_voxels
        )
        feats = jnp.where(
            vmask[:, None],
            points[src] if points.shape[1] > 3 else shifted[src],
            0.0,
        )
        f, cc, mm = SparseDetBackbone(name="backbone3d")(feats, coords, vmask)

        # height compression: scatter deepest level into a dense BEV grid,
        # concatenating z-bins channel-wise (pcdet HeightCompression).
        Hb, Wb = self.bev_shape
        nz = max(int(round((pr[5] - pr[2]) / self.voxel_size)) // 8, 1)
        C = f.shape[-1]
        dense = jnp.zeros((nz, Hb, Wb, C), f.dtype)
        zi = jnp.clip(cc[:, 2], 0, nz - 1)
        yi = jnp.clip(cc[:, 1], 0, Hb - 1)
        xi = jnp.clip(cc[:, 0], 0, Wb - 1)
        zi = jnp.where(mm, zi, nz)
        dense = dense.at[zi, yi, xi].add(
            jnp.where(mm[:, None], f, 0.0), mode="drop"
        )
        bev = jnp.transpose(dense, (1, 2, 0, 3)).reshape(Hb, Wb, nz * C)

        h = BEVBackbone(name="backbone2d")(bev[None])[0]
        A = len(self.anchor_rotations) * len(self.anchor_sizes)
        cls = nn.Conv(A * self.num_classes, (1, 1), name="cls_head")(h)
        box = nn.Conv(A * 7, (1, 1), name="box_head")(h)
        dirc = nn.Conv(A * 2, (1, 1), name="dir_head")(h)

        anchors = jnp.asarray(self.anchors())
        boxes = decode_boxes(box.reshape(Hb, Wb, A, 7), anchors)
        return {
            "boxes": boxes.reshape(-1, 7),
            "scores": jax.nn.sigmoid(cls.reshape(-1, self.num_classes)),
            "dir_logits": dirc.reshape(-1, 2),
        }


def predict(
    model: VoxelDetector,
    params,
    points: jnp.ndarray,
    point_mask: jnp.ndarray,
    score_thresh: float = 0.3,
    nms_thresh: float = 0.2,
    max_dets: int = 128,
):
    """Full single-cloud detection: forward → top scores → dir flip →
    rotated BEV NMS → (boxes (K, 7), scores (K,), labels (K,), valid (K,))."""
    out = model.apply(params, points, point_mask)
    scores = out["scores"]
    best = jnp.max(scores, axis=-1)
    labels = jnp.argmax(scores, axis=-1)
    boxes = out["boxes"]
    flip = jnp.argmax(out["dir_logits"], axis=-1)
    yaw = boxes[..., 6] + flip * np.pi
    boxes = boxes.at[..., 6].set(yaw)

    k = min(max_dets * 4, boxes.shape[0])
    top, idx = jax.lax.top_k(best, k)
    cand_boxes = boxes[idx]
    cand_labels = labels[idx]
    cand_valid = top >= score_thresh
    order, keep = nms(cand_boxes, top, nms_thresh, box_mask=cand_valid)
    order, keep = order[:max_dets], keep[:max_dets]
    return (
        cand_boxes[order],
        top[order],
        cand_labels[order],
        keep,
    )
