"""LiDARGen RefineNet / NCSN backbone (legacy support), flax / NHWC.

Re-designs ``lidargen/models/refinenet.py`` (233 LoC): circular convs on the
azimuth axis, InstanceNorm2dPlus conditioning-free normalization, dilated
residual encoder, RefineNet decoder (RCU + chained residual pooling with
bilinear upsampling).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bilinear_resize(x, shape):
    """align_corners=True bilinear (torch F.interpolate semantics)."""
    B, H, W, C = x.shape
    out_h, out_w = shape
    if (H, W) == (out_h, out_w):
        return x
    ys = jnp.linspace(0, H - 1, out_h)
    xs = jnp.linspace(0, W - 1, out_w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (
        a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
    )


class CircularConv(nn.Module):
    """Conv with circular padding on BOTH spatial dims (torch
    padding_mode='circular'); cf. ``refinenet.py:16-18``."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.padding
        if p > 0:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="wrap")
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="VALID",
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
        )(x)


class InstanceNormPlus(nn.Module):
    """cf. ``refinenet.py:21-40``: instance norm whose scale is modulated by
    the normalized per-channel means, then a depthwise 1×1 affine."""

    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        alpha = self.param(
            "alpha", lambda k, s: 1 + 0.02 * jax.random.normal(k, s), (C,)
        )
        w = self.param(
            "post_weight", lambda k, s: 1 + 0.02 * jax.random.normal(k, s), (C,)
        )
        b = self.param("post_bias", nn.initializers.zeros, (C,)) if self.use_bias else 0
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        m = jnp.mean(mean, axis=-1, keepdims=True)
        v = jnp.var(mean, axis=-1, keepdims=True, ddof=1)
        mean_n = (mean - m) / jnp.sqrt(v + 1e-5)
        inst = (x - mean) / jnp.sqrt(
            jnp.var(x, axis=(1, 2), keepdims=True) + 1e-5
        )
        h = inst * alpha * mean_n
        return h * w + b


class RefineResidualBlock(nn.Module):
    """cf. ``refinenet.py:43-94``."""

    out_channels: int
    resample: str | None = None
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch if self.resample == "down" else self.out_channels
        h = InstanceNormPlus(name="norm1")(x)
        h = nn.elu(h)
        h = CircularConv(mid, 3, self.dilation, self.dilation, name="conv1")(h)
        h = InstanceNormPlus(name="norm2")(h)
        h = nn.elu(h)
        h = CircularConv(self.out_channels, 3, self.dilation, self.dilation, name="conv2")(h)
        skip = x
        if in_ch != self.out_channels or self.resample is not None:
            if self.dilation == 1:
                skip = CircularConv(self.out_channels, 1, 0, 1, name="skip")(skip)
            else:
                skip = CircularConv(
                    self.out_channels, 3, self.dilation, self.dilation, name="skip"
                )(skip)
            if self.dilation == 1 and self.resample is not None:
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                skip = nn.avg_pool(skip, (2, 2), strides=(2, 2))
        return skip + h


class ResidualConvUnit(nn.Module):
    """cf. ``refinenet.py:97-111``."""

    num_blocks: int = 2
    num_stages: int = 2

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        for b in range(self.num_blocks):
            h = x
            for s in range(self.num_stages):
                h = nn.elu(h)
                h = CircularConv(C, 3, 1, use_bias=False, name=f"b{b}s{s}")(h)
            x = x + h
        return x


class ChainedResidualPooling(nn.Module):
    """cf. ``refinenet.py:114-130``: ELU then chained maxpool(5,1,2)+conv adds."""

    num_stages: int = 2

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = nn.elu(x)
        for s in range(self.num_stages):
            p = nn.max_pool(h, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))
            h = h + CircularConv(C, 3, 1, use_bias=False, name=f"crp{s}")(p)
        return h


class RefineBlock(nn.Module):
    """cf. ``refinenet.py:133-154``."""

    out_channels: int
    num_inputs: int
    num_end_blocks: int = 1

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], shape):
        h = 0
        for i, x in enumerate(xs):
            r = ResidualConvUnit(name=f"rcu{i}")(x)
            if self.num_inputs > 1:
                r = CircularConv(self.out_channels, 3, 1, name=f"adapt{i}")(r)
            h = h + _bilinear_resize(r, shape)
        h = ChainedResidualPooling(name="crp")(h)
        return ResidualConvUnit(num_blocks=self.num_end_blocks, name="out_rcu")(h)


class LiDARGenRefineNet(nn.Module):
    """cf. ``refinenet.py:157-233``; NHWC ``__call__(images, timesteps)``
    (timesteps unused, NCSN-style)."""

    in_channels: int
    resolution: tuple[int, int]
    out_channels: int | None = None
    base_channels: int = 128
    channel_multiplier: Sequence[int] = (1, 2, 2, 2)

    @nn.compact
    def __call__(self, images, _timesteps=None):
        B = images.shape[0]
        H, W = self.resolution
        phi = np.linspace(0, 1, H)
        theta = np.linspace(0, 1, W)
        gp, gt = np.meshgrid(phi, theta, indexing="ij")
        coords = jnp.asarray(np.stack([gp, gt], -1), images.dtype)
        h = jnp.concatenate(
            [images, jnp.broadcast_to(coords[None], (B, H, W, 2))], axis=-1
        )

        mult = list(self.channel_multiplier)
        C = [self.base_channels] + [self.base_channels * m for m in mult]
        h = nn.Conv(C[0], (3, 3), padding=((1, 1), (1, 1)), name="in_conv")(h)
        h1 = RefineResidualBlock(C[1], name="d1a")(h)
        h1 = RefineResidualBlock(C[1], name="d1b")(h1)
        h2 = RefineResidualBlock(C[2], resample="down", name="d2a")(h1)
        h2 = RefineResidualBlock(C[2], name="d2b")(h2)
        h3 = RefineResidualBlock(C[3], resample="down", dilation=2, name="d3a")(h2)
        h3 = RefineResidualBlock(C[3], dilation=2, name="d3b")(h3)
        h4 = RefineResidualBlock(C[4], resample="down", dilation=4, name="d4a")(h3)
        h4 = RefineResidualBlock(C[4], dilation=4, name="d4b")(h4)

        u = RefineBlock(C[3], 1, name="u4")([h4], h4.shape[1:3])
        u = RefineBlock(C[2], 2, name="u3")([h3, u], h3.shape[1:3])
        u = RefineBlock(C[1], 2, name="u2")([h2, u], h2.shape[1:3])
        u = RefineBlock(C[0], 2, num_end_blocks=3, name="u1")([h1, u], h1.shape[1:3])
        u = InstanceNormPlus(name="out_norm")(u)
        u = nn.elu(u)
        out_ch = self.out_channels or self.in_channels
        return nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), name="out_conv")(u)
