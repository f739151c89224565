"""OpenAI/LDM ADM UNet (legacy alternative backbone).

TPU-native re-design of the vendored UNet the reference registers as
``openai_unet`` (``lidargen/models/unets/openai_unet.py:415-776``
``OpenAIUNetModel``) — NHWC, flax, ring (circular azimuth) convs, scan-free
static structure.  Shares the ADM primitives with ``layout_unet.py``
(ResBlockADM / GLIDEAttentionBlock / Resample) and adds:

* LDM-style timestep embedding (``ldm_diffusion_util.py:174-192``:
  freqs ``/half``, cos-then-sin order),
* optional class conditioning (``label_emb``, ``openai_unet.py:530-531``),
* optional coords encodings (spherical_harmonics / polar_coordinates /
  fourier_features; ``openai_unet.py:516-527``),
* a minimal SpatialTransformer for cross-attention conditioning
  (LDM ``attention.py`` BasicTransformerBlock: self-attn → cross-attn →
  GEGLU FF, all pre-norm with zero-init output projection).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

import flax.linen as nn
import jax.numpy as jnp

from . import encoding as enc
from .layout_unet import Downsample, GLIDEAttentionBlock, ResBlockADM, Upsample, gn32
from .ops import GroupNorm32
from .ops import RingConv


def ldm_timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10_000):
    """cf. ``ldm_diffusion_util.py:174-192`` (cos first, freqs /half)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GEGLU(nn.Module):
    """LDM feed-forward gate: ``x W1 * gelu(x W2)``."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, name="proj")(x)
        a, b = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(b)


class CrossAttention(nn.Module):
    """Pre-norm multi-head attention; context=None → self-attention."""

    num_heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)

        def heads(t):
            B, L, _ = t.shape
            return t.reshape(B, L, self.num_heads, self.head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(x.shape[0], x.shape[1], inner)
        return nn.Dense(x.shape[-1], name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, context=None):
        x = x + CrossAttention(self.num_heads, self.head_dim, name="attn1")(
            nn.LayerNorm(name="norm1")(x)
        )
        x = x + CrossAttention(self.num_heads, self.head_dim, name="attn2")(
            nn.LayerNorm(name="norm2")(x), context
        )
        h = nn.LayerNorm(name="norm3")(x)
        h = GEGLU(4 * x.shape[-1], name="ff_geglu")(h)
        return x + nn.Dense(x.shape[-1], name="ff_out")(h)


class SpatialTransformer(nn.Module):
    """norm → 1x1 in → depth x transformer block → zero-init 1x1 out + skip."""

    num_heads: int
    head_dim: int
    depth: int = 1

    @nn.compact
    def __call__(self, x, context=None):
        B, H, W, C = x.shape
        # LDM Normalize: GroupNorm eps=1e-6 (attention.py:78-79)
        h = GroupNorm32(num_groups=32, epsilon=1e-6, name="norm")(x)
        h = nn.Dense(self.num_heads * self.head_dim, name="proj_in")(h)
        h = h.reshape(B, H * W, -1)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.num_heads, self.head_dim, name=f"block{d}"
            )(h, context)
        h = h.reshape(B, H, W, -1)
        h = nn.Dense(C, kernel_init=nn.initializers.zeros, name="proj_out")(h)
        return x + h


class OpenAIUNet(nn.Module):
    """cf. ``OpenAIUNetModel`` (``openai_unet.py:415-776``).

    ``__call__(x (B,H,W,C), cond_dict, y=None)`` with
    ``cond_dict = {'time_condition': (B,), 'other_condition': optional (B,L,D)
    cross-attention context}``.  ``ring=True`` reproduces the lidm circular
    azimuth convs (``cconv``); class-conditional when ``num_classes`` set.
    """

    resolution: tuple[int, int]
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = (4, 8)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: int | None = None
    num_heads: int = -1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: int | None = None
    ring: bool = True
    coords_encoding: str | None = None

    def _heads_dim(self, ch: int, upsample: bool = False):
        """Head count / width logic; cf. ``openai_unet.py:560-567`` (legacy)."""
        if self.num_head_channels == -1:
            n = self.num_heads
        else:
            n = ch // self.num_head_channels
        if upsample and self.num_heads_upsample != -1 and not self.use_spatial_transformer:
            n = self.num_heads_upsample
        return max(n, 1), ch // max(n, 1)

    def _attn(self, ch: int, upsample: bool, name: str):
        heads, dim_head = self._heads_dim(ch, upsample)
        if self.use_spatial_transformer:
            return SpatialTransformer(
                heads, dim_head, depth=self.transformer_depth, name=name
            )
        return GLIDEAttentionBlock(num_heads=heads, encoder_channels=None, name=name)

    @nn.compact
    def __call__(self, x, cond_dict, y=None, deterministic: bool = True):
        timesteps = cond_dict["time_condition"]
        context = cond_dict.get("other_condition", None)
        assert (y is not None) == (self.num_classes is not None)
        B = x.shape[0]
        if timesteps.ndim == 0:
            timesteps = jnp.full((B,), timesteps)

        temb_dim = self.model_channels * 4
        emb = ldm_timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(temb_dim, name="time_dense1")(emb.astype(x.dtype))
        emb = nn.Dense(temb_dim, name="time_dense2")(nn.silu(emb))
        if self.num_classes is not None:
            emb = emb + nn.Embed(self.num_classes, temb_dim, name="label_emb")(y)

        h = x
        if self.coords_encoding is not None:
            coords = enc.generate_polar_coords(*self.resolution).astype(np.float64)
            cenc = enc.encode_coords(coords, self.coords_encoding, self.resolution)
            h = jnp.concatenate(
                [h, jnp.broadcast_to(jnp.asarray(cenc, h.dtype)[None], (B, *cenc.shape))],
                axis=-1,
            )

        def res(ch, name, **kw):
            return ResBlockADM(
                out_channels=ch,
                dropout=self.dropout,
                use_scale_shift_norm=self.use_scale_shift_norm,
                ring=self.ring,
                name=name,
                **kw,
            )

        def attn_apply(block, hh):
            if self.use_spatial_transformer:
                return block(hh, context)
            return block(hh, None)

        ch = self.model_channels
        h = RingConv(ch, ring=self.ring, name="in_conv")(h)
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = res(ch, f"in_{level}_{i}_res")(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = attn_apply(self._attn(ch, False, f"in_{level}_{i}_attn"), h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(ch, f"in_{level}_down", down=True)(h, emb, deterministic)
                else:
                    h = Downsample(
                        ch, use_conv=self.conv_resample, ring=self.ring,
                        name=f"in_{level}_down",
                    )(h)
                hs.append(h)
                ds *= 2

        h = res(ch, "mid_res1")(h, emb, deterministic)
        h = attn_apply(self._attn(ch, False, "mid_attn"), h)
        h = res(ch, "mid_res2")(h, emb, deterministic)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                ch = int(mult * self.model_channels)
                h = res(ch, f"out_{level}_{i}_res")(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = attn_apply(self._attn(ch, True, f"out_{level}_{i}_attn"), h)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res(ch, f"out_{level}_up", up=True)(h, emb, deterministic)
                    else:
                        h = Upsample(
                            ch, use_conv=self.conv_resample, ring=self.ring,
                            name=f"out_{level}_up",
                        )(h)
                    ds //= 2

        h = nn.silu(gn32(name="out_norm")(h))
        return RingConv(
            self.out_channels, ring=self.ring, zero_init=True, name="out_conv"
        )(h)
