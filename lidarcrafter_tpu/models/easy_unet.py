"""Trivial condition encoders (flax): Identity + SpatialRescaler.

Re-designs ``lidargen/models/unets/easy_unet.py`` (registry keys ``easy_unet``
and ``identity``, ``lidargen/models/unets/__init__.py:25,27``).  These pass the
raw condition tensor through, optionally resizing it (align_corners=True
bilinear, matching ``torch.nn.functional.interpolate``) and remapping channels
with a 1×1 conv.

Layout is NHWC (TPU-native); strides apply to the (H, W) axes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class Identity(nn.Module):
    """cf. ``easy_unet.py:6-12`` — returns ``data_dict['cond']`` unchanged."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, data_dict: dict) -> jnp.ndarray:
        return data_dict["cond"]


def _resize_axis_align_corners(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    """1D linear resample along ``axis`` with align_corners=True semantics:
    output sample i reads input coordinate ``i * (in - 1) / (out - 1)``."""
    in_size = x.shape[axis]
    if out_size == in_size:
        return x
    if out_size == 1 or in_size == 1:
        idx = jnp.zeros((out_size,), jnp.int32)
        return jnp.take(x, idx, axis=axis)
    pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 2)
    frac = pos - lo.astype(jnp.float32)
    a = jnp.take(x, lo, axis=axis)
    b = jnp.take(x, lo + 1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = frac.reshape(shape)
    return a * (1.0 - w) + b * w


def bilinear_resize_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize with torch ``align_corners=True`` semantics."""
    x = _resize_axis_align_corners(x, 1, out_hw[0])
    return _resize_axis_align_corners(x, 2, out_hw[1])


class SpatialRescaler(nn.Module):
    """cf. ``easy_unet.py:14-39`` — chain of (h_stride, w_stride) bilinear
    downsamples (``scale_factor=(1/h_s, 1/w_s)``, align_corners=True) followed
    by an optional 1×1 channel remap conv."""

    strides: Sequence[Tuple[int, int]] = ()
    method: str = "bilinear"
    in_channels: int = 3
    out_channels: int | None = None
    bias: bool = False

    @nn.compact
    def __call__(self, data_dict: dict) -> jnp.ndarray:
        x = data_dict["cond"]
        for h_s, w_s in self.strides:
            # torch interpolate(scale_factor=s) output size = floor(in * s)
            out_hw = (int(x.shape[1] // h_s), int(x.shape[2] // w_s))
            if self.method in ("bilinear", "linear", "trilinear"):
                x = bilinear_resize_align_corners(x, out_hw)
            elif self.method == "nearest":
                hi = (jnp.arange(out_hw[0]) * x.shape[1] // out_hw[0]).astype(jnp.int32)
                wi = (jnp.arange(out_hw[1]) * x.shape[2] // out_hw[1]).astype(jnp.int32)
                x = x[:, hi][:, :, wi]
            else:
                raise NotImplementedError(self.method)
        if self.out_channels is not None:
            x = nn.Conv(
                self.out_channels, (1, 1), use_bias=self.bias, name="channel_mapper"
            )(x)
        return x
