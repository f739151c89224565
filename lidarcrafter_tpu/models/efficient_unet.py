"""EfficientUNet range-image denoiser (R2DM-derived) in flax / NHWC.

TPU-native re-design of ``lidargen/models/unets/efficient_unet.py:193-300``
and ``efficient_unet_cond.py:188-296``:

- NHWC activations so XLA tiles convs directly onto the MXU;
- ring (circular) horizontal padding everywhere (the azimuth axis is periodic);
- coordinate encodings (SH / polar / Fourier) concatenated as input channels,
  computed from static module config (no registered buffers);
- 4-level encoder/decoder with FIR resampling, AdaGN timestep conditioning,
  full self-attention at the deepest level.

For "spherical" projections the reference overwrites the coords buffer with
linear ray angles (``lidargen/utils/inference.py:281-282``); here that is the
``use_ray_angle_coords`` switch.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import jax.numpy as jnp
from flax import linen as nn

import numpy as np

from ..utils.lidar import get_linear_ray_angles_np
from . import encoding as enc
from .ops import (
    MFSelfAttention2d,
    Resample,
    ResidualBlock,
    RingConv,
    SelfAttention2d,
    adm_timestep_embedding,
    sinusoidal_embedding,
)


def _n_tuple(x, N: int) -> tuple:
    if isinstance(x, Iterable):
        x = tuple(x)
        assert len(x) == N
        return x
    return (x,) * N


class TimeEmbedding(nn.Module):
    """sinusoidal → Dense → SiLU → Dense; cf. ``efficient_unet.py:237-242``.

    ``adm=True`` swaps in the ADM/GLIDE ``timestep_embedding`` sinusoid
    (``nn.py:114-132``), used by the v0 LayoutUnet (``layout_unet.py:915``).
    Param names are unchanged, so converters are shared.
    """

    base_channels: int
    temb_channels: int
    adm: bool = False

    @nn.compact
    def __call__(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        embed = adm_timestep_embedding if self.adm else sinusoidal_embedding
        h = embed(timesteps, self.base_channels)
        h = nn.Dense(self.temb_channels)(h)
        h = nn.silu(h)
        h = nn.Dense(self.temb_channels)(h)
        return h


class UNetBlock(nn.Module):
    """down/residuals/attn/up block; cf. ``efficient_unet.py:118-190``."""

    in_features: int
    features: int
    num_residual_blocks: int
    gn_num_groups: int = 8
    gn_eps: float = 1e-6
    attn: bool = False
    attn_num_heads: int = 8
    up: int = 1
    down: int = 1
    dropout: float = 0.0
    ring: bool = False
    mf_attn: bool = False  # timm qk-norm attention (MeanFlow variant)

    @nn.compact
    def __call__(self, h: jnp.ndarray, temb: jnp.ndarray | None = None) -> jnp.ndarray:
        if self.down > 1:
            h = RingConv(self.features, ring=self.ring, name="down_conv")(h)
            h = Resample(down=self.down, ring=self.ring, name="down_resample")(h)
        for i in range(self.num_residual_blocks):
            h = ResidualBlock(
                features=self.features,
                gn_num_groups=self.gn_num_groups,
                gn_eps=self.gn_eps,
                dropout=self.dropout,
                ring=self.ring,
                name=f"res{i}",
            )(h, temb)
        if self.attn:
            attn_cls = MFSelfAttention2d if self.mf_attn else SelfAttention2d
            h = attn_cls(
                num_heads=self.attn_num_heads,
                gn_num_groups=self.gn_num_groups,
                gn_eps=self.gn_eps,
                name="attn",
            )(h)
        if self.up > 1:
            h = Resample(up=self.up, ring=self.ring, name="up_resample")(h)
            h = RingConv(self.features, ring=self.ring, name="up_conv")(h)
        return h


class EfficientUNet(nn.Module):
    """cf. ``lidargen/models/unets/efficient_unet.py:193-300``.

    ``__call__(images (B,H,W,C), timesteps (B,))`` → (B,H,W,out).
    """

    in_channels: int
    resolution: tuple[int, int]
    out_channels: int | None = None
    base_channels: int = 128
    temb_channels: int | None = None
    channel_multiplier: Sequence[int] | int = (1, 2, 4, 8)
    num_residual_blocks: Sequence[int] | int = (3, 3, 3, 3)
    gn_num_groups: int = 8
    gn_eps: float = 1e-6
    attn_num_heads: int = 8
    coords_encoding: str | None = "spherical_harmonics"
    ring: bool = True
    mf_attn: bool = False  # MeanFlow variant: timm qk-norm attention blocks
    use_ray_angle_coords: bool = False
    fov_up: float = 10.0
    fov_down: float = -30.0

    def coords(self) -> np.ndarray:
        """Static (H, W, 2) coordinate grid, computed host-side in float64."""
        if self.use_ray_angle_coords:
            return get_linear_ray_angles_np(
                *self.resolution, fov_up=self.fov_up, fov_down=self.fov_down
            )
        return enc.generate_polar_coords(*self.resolution).astype(np.float64)

    @nn.compact
    def __call__(self, images: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
        h = images
        B = h.shape[0]
        if timesteps.ndim == 0:
            timesteps = jnp.full((B,), timesteps)

        temb_channels = self.temb_channels or self.base_channels * 4
        temb = TimeEmbedding(self.base_channels, temb_channels, name="time_embedding")(
            timesteps
        )
        # the sinusoid computes in f32 (precision); cast to the image dtype so
        # bf16 inference doesn't promote every AdaGN scale/shift — and with it
        # the whole conv path — to f32 (measured 2x HBM traffic)
        return self.unet_body(h, temb.astype(h.dtype))

    def unet_body(self, h: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        B = h.shape[0]
        cenc = enc.encode_coords(self.coords(), self.coords_encoding, self.resolution)
        if cenc is not None:
            cenc = jnp.broadcast_to(cenc[None], (B, *cenc.shape)).astype(h.dtype)
            h = jnp.concatenate([h, cenc], axis=-1)

        mult = _n_tuple(self.channel_multiplier, 4)
        N = _n_tuple(self.num_residual_blocks, 4)
        C = [self.base_channels] + [self.base_channels * m for m in mult]
        cfgs = dict(
            gn_num_groups=self.gn_num_groups,
            gn_eps=self.gn_eps,
            attn_num_heads=self.attn_num_heads,
            dropout=0.0,
            ring=self.ring,
            mf_attn=self.mf_attn,
        )

        h = RingConv(C[0], ring=self.ring, name="in_conv")(h)
        h1 = UNetBlock(C[0], C[1], N[0], **cfgs, name="d_block1")(h, temb)
        h2 = UNetBlock(C[1], C[2], N[1], down=2, **cfgs, name="d_block2")(h1, temb)
        h3 = UNetBlock(C[2], C[3], N[2], down=2, **cfgs, name="d_block3")(h2, temb)
        h4 = UNetBlock(C[3], C[4], N[3], down=2, attn=True, **cfgs, name="d_block4")(
            h3, temb
        )
        u = UNetBlock(C[4], C[3], N[3], up=2, attn=True, **cfgs, name="u_block4")(
            h4, temb
        )
        u = UNetBlock(2 * C[3], C[2], N[2], up=2, **cfgs, name="u_block3")(
            jnp.concatenate([u, h3], axis=-1), temb
        )
        u = UNetBlock(2 * C[2], C[1], N[1], up=2, **cfgs, name="u_block2")(
            jnp.concatenate([u, h2], axis=-1), temb
        )
        u = UNetBlock(2 * C[1], C[0], N[0], **cfgs, name="u_block1")(
            jnp.concatenate([u, h1], axis=-1), temb
        )
        out_ch = self.out_channels or self.in_channels
        return RingConv(out_ch, ring=self.ring, zero_init=True, name="out_conv")(u)


class EfficientUNetCond(EfficientUNet):
    """Conditional variant; cf. ``efficient_unet_cond.py:188-296``.

    Topology-identical; the engine pre-concatenates condition channels onto the
    input and passes the timestep via ``condition_dict['time_condition']``.
    """

    @nn.compact
    def __call__(self, images: jnp.ndarray, condition_dict: dict) -> jnp.ndarray:
        return super().__call__(images, condition_dict["time_condition"])


class MFEfficientUNet(EfficientUNet):
    """Two-time (t, r) UNet for MeanFlow; cf. ``efficient_mf_unet.py:193-315``:
    same trunk with dual time embeddings summed (:280-315) and timm qk-norm
    attention blocks (:32-57) instead of the base MHA."""

    mf_attn: bool = True

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        start_timesteps: jnp.ndarray,
        end_timesteps: jnp.ndarray,
        condition=None,
    ) -> jnp.ndarray:
        B = images.shape[0]
        if start_timesteps.ndim == 0:
            start_timesteps = jnp.full((B,), start_timesteps)
        if end_timesteps.ndim == 0:
            end_timesteps = jnp.full((B,), end_timesteps)
        temb_channels = self.temb_channels or self.base_channels * 4
        start = TimeEmbedding(
            self.base_channels, temb_channels, name="start_time_embedding"
        )(start_timesteps)
        end = TimeEmbedding(
            self.base_channels, temb_channels, name="end_time_embedding"
        )(end_timesteps)
        return self.unet_body(images, (start + end).astype(images.dtype))
