"""PointMLP point-cloud classifier (CGF backbone + aux trainer model), flax.

Re-designs ``lidargen/metrics/extractor/pointmlp.py`` (367 LoC): geometric
affine local grouping (FPS + kNN from ``lidarcrafter_tpu.ops``), per-group
residual MLP extraction, and the BN classifier head.  Supports both training
(mutable ``batch_stats``) and frozen inference (``use_running_average=True``)
— the CGF metric (``fg_object.py:190-231``) evaluates classification accuracy
binned by point count.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.points import farthest_point_sampling, knn


class ConvBNReLU(nn.Module):
    """Dense + BN + ReLU over the last axis; cf. ``ConvBNReLU1D`` (:186-197)."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, use_bias=self.use_bias, name="dense")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            axis=-1,
            axis_name=None,
            name="bn",
        )(x)
        return nn.relu(x)


class ConvBNReLURes(nn.Module):
    """Residual MLP block; cf. ``ConvBNReLURes1D`` (:200-230)."""

    channel: int
    res_expansion: float = 1.0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.channel * self.res_expansion)
        h = ConvBNReLU(mid, self.use_bias, name="net1")(x, train)
        h = nn.Dense(self.channel, use_bias=self.use_bias, name="net2_dense")(h)
        h = nn.BatchNorm(use_running_average=not train, axis=-1, name="net2_bn")(h)
        return nn.relu(h + x)


class LocalGrouper(nn.Module):
    """FPS + kNN grouping with geometric affine; cf. ``LocalGrouper`` (:130-183)."""

    channel: int
    groups: int
    kneighbors: int
    use_xyz: bool = False
    normalize: str = "anchor"

    @nn.compact
    def __call__(self, xyz, points):
        B, N, _ = xyz.shape
        S = self.groups
        fps_idx = farthest_point_sampling(xyz, S)  # (B, S)
        new_xyz = jnp.take_along_axis(xyz, fps_idx[..., None], axis=1)
        new_points = jnp.take_along_axis(points, fps_idx[..., None], axis=1)

        k = min(self.kneighbors, N)  # small test clouds: clamp to available points
        _, idx = knn(new_xyz, xyz, k)  # (B, S, k)
        grouped_xyz = jax.vmap(lambda p, i: p[i])(xyz, idx)  # (B, S, k, 3)
        grouped_points = jax.vmap(lambda p, i: p[i])(points, idx)
        if self.use_xyz:
            grouped_points = jnp.concatenate([grouped_points, grouped_xyz], axis=-1)
        if self.normalize in ("center", "anchor"):
            d = grouped_points.shape[-1]
            alpha = self.param("affine_alpha", nn.initializers.ones, (1, 1, 1, d))
            beta = self.param("affine_beta", nn.initializers.zeros, (1, 1, 1, d))
            if self.normalize == "center":
                mean = jnp.mean(grouped_points, axis=2, keepdims=True)
            else:
                anchor = (
                    jnp.concatenate([new_points, new_xyz], axis=-1)
                    if self.use_xyz
                    else new_points
                )
                mean = anchor[:, :, None, :]
            centered = grouped_points - mean
            # torch.std over the flattened per-batch tensor, Bessel-corrected
            flat = centered.reshape(B, -1)
            n = flat.shape[1]
            std = jnp.sqrt(
                jnp.sum((flat - jnp.mean(flat, axis=1, keepdims=True)) ** 2, axis=1)
                / (n - 1)
            )[:, None, None, None]
            grouped_points = centered / (std + 1e-5)
            grouped_points = alpha * grouped_points + beta
        rep = jnp.broadcast_to(
            new_points[:, :, None, :], (*new_points.shape[:2], k, new_points.shape[-1])
        )
        return new_xyz, jnp.concatenate([grouped_points, rep], axis=-1)


class PreExtraction(nn.Module):
    """Per-group MLPs + max pool over neighbors; cf. ``PreExtraction`` (:233-261)."""

    out_channels: int
    blocks: int = 2
    res_expansion: float = 1.0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, S, k, d)
        B, S, k, d = x.shape
        h = x.reshape(B * S, k, d)
        h = ConvBNReLU(self.out_channels, self.use_bias, name="transfer")(h, train)
        for i in range(self.blocks):
            h = ConvBNReLURes(
                self.out_channels, self.res_expansion, self.use_bias, name=f"op{i}"
            )(h, train)
        h = jnp.max(h, axis=1)  # (B*S, C)
        return h.reshape(B, S, self.out_channels)


class PointMLP(nn.Module):
    """cf. ``Model`` (:283-345) / ``pointMLP`` factory (:348-352).

    ``__call__(x (B, N, 3), train, return_features)``.
    """

    points: int = 1024
    class_num: int = 40
    embed_dim: int = 64
    res_expansion: float = 1.0
    use_bias: bool = False
    use_xyz: bool = False
    normalize: str = "anchor"
    dim_expansion: Sequence[int] = (2, 2, 2, 2)
    pre_blocks: Sequence[int] = (2, 2, 2, 2)
    pos_blocks: Sequence[int] = (2, 2, 2, 2)
    k_neighbors: Sequence[int] = (24, 24, 24, 24)
    reducers: Sequence[int] = (2, 2, 2, 2)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        B, N, _ = x.shape
        xyz = x
        h = ConvBNReLU(self.embed_dim, self.use_bias, name="embedding")(x, train)
        last = self.embed_dim
        anchor = self.points
        for i in range(len(self.pre_blocks)):
            out_ch = last * self.dim_expansion[i]
            anchor = anchor // self.reducers[i]
            xyz, grouped = LocalGrouper(
                last, anchor, self.k_neighbors[i], self.use_xyz, self.normalize,
                name=f"grouper{i}",
            )(xyz, h)
            h = PreExtraction(
                out_ch, self.pre_blocks[i], self.res_expansion, self.use_bias,
                name=f"pre{i}",
            )(grouped, train)
            for j in range(self.pos_blocks[i]):
                h = ConvBNReLURes(
                    out_ch, self.res_expansion, self.use_bias, name=f"pos{i}_{j}"
                )(h, train)
            last = out_ch

        feat = jnp.max(h, axis=1)  # (B, C)
        if return_features:
            return feat
        h = nn.Dense(512, name="cls0")(feat)
        h = nn.BatchNorm(use_running_average=not train, axis=-1, name="cls_bn0")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(256, name="cls1")(h)
        h = nn.BatchNorm(use_running_average=not train, axis=-1, name="cls_bn1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.class_num, name="cls2")(h)


def point_mlp(num_classes: int = 40, **kwargs) -> PointMLP:
    """cf. ``pointMLP`` factory (:348-352)."""
    return PointMLP(class_num=num_classes, **kwargs)


def point_mlp_elite(num_classes: int = 40, **kwargs) -> PointMLP:
    """cf. ``pointMLPElite`` (:355-359)."""
    return PointMLP(
        class_num=num_classes, embed_dim=32, res_expansion=0.25,
        dim_expansion=(2, 2, 2, 1), pre_blocks=(1, 1, 2, 1), pos_blocks=(1, 1, 2, 1),
        **kwargs,
    )
