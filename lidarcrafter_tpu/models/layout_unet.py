"""Layout-conditioned range-image denoiser (GLIDE/ADM-style UNet) in flax / NHWC.

TPU-native re-design of ``lidargen/models/unets/layout_unet_v1.py:599-901``:

- ADM ResBlocks with scale-shift GroupNorm(32) conditioning, FIR-resampled
  up/down residual blocks (``resblock_updown``), ring convs on the periodic
  azimuth axis;
- ``ObjectAwareCrossAttention`` (``layout_unet_v1.py:347-532``): image-patch
  tokens and layout tokens share one attention where queries/keys carry
  separate content and positional (bbox-embedding) channels;
- GLIDE ``AttentionBlock`` with prepended encoder K/V kept for the
  ``attention_block_type='GLIDE'`` path (``layout_unet_v1.py:245-345``);
- time embedding += ``xf_proj`` of the layout encoder; ``concat_cond``
  channels are appended to the input (``layout_unet_v1.py:858-878``).

Tokens flatten row-major (h·W + w), matching the reference's
``x.reshape(b, c, -1)`` and the patch-bbox ordering of the encoder.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from . import encoding as enc
from ..ops.pallas_attention import (
    attention_bhld,
    oaca_attention,
    use_fused_attention,
)
from ..utils.lidar import get_linear_ray_angles_np
from .efficient_unet import TimeEmbedding
from .ops import GroupNorm32, Resample, RingConv, softmax_f32_math


def gn32(name=None):
    # direct-variance GroupNorm: flax's E[x^2]-E[x]^2 form cancels
    # catastrophically on small groups (see ops.GroupNorm32)
    return GroupNorm32(num_groups=32, epsilon=1e-5, name=name)


class ResBlockADM(nn.Module):
    """ADM residual block; cf. ``layout_unet_v1.py:141-252`` (ResBlock)."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    ring: bool = True
    fir: bool = True  # False = v0's ADM h_upd/x_upd (nearest / avg-pool)

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = gn32(name="in_norm")(x, silu=True)
        if self.up or self.down:
            if self.fir:
                op = Resample(
                    up=2 if self.up else 1, down=2 if self.down else 1, ring=self.ring,
                    name="updown",
                )
            elif self.up:
                # v0 h_upd/x_upd = Upsample(use_conv=False): 2x nearest
                # (``layout_unet.py:190-193,102-107``)
                op = lambda t: jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
            else:
                # v0 Downsample(use_conv=False): 2x2 avg pool
                # (``layout_unet.py:193-196,134-139``)
                op = lambda t: nn.avg_pool(t, (2, 2), strides=(2, 2))
            h = op(h)
            x = op(x)
        h = RingConv(self.out_channels, ring=self.ring, name="in_conv")(h)
        emb_ch = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = nn.Dense(emb_ch, name="emb_proj")(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = gn32(name="out_norm")(h, scale_shift=(scale, shift), silu=True)
        else:
            h = h + emb_out
            h = gn32(name="out_norm")(h, silu=True)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        h = RingConv(self.out_channels, ring=self.ring, zero_init=True, name="out_conv")(h)
        if in_ch != self.out_channels:
            x = RingConv(self.out_channels, kernel_size=(1, 1), padding=0, name="skip")(x)
        return x + h


class Downsample(nn.Module):
    """Stride-2 ring conv (or avg pool); cf. ``layout_unet_v1.py:113-139``."""

    out_channels: int
    use_conv: bool = True
    ring: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return RingConv(
                self.out_channels, stride=2, ring=self.ring, name="op"
            )(x)
        assert x.shape[-1] == self.out_channels
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    """2x nearest upsample + ring conv; cf. ``layout_unet_v1.py:81-110``."""

    out_channels: int
    use_conv: bool = True
    ring: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.use_conv:
            x = RingConv(self.out_channels, ring=self.ring, name="conv")(x)
        return x


def _split_heads(t: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, L, C) → (B, heads, L, C/heads), channel-blocked per head (torch order)."""
    B, L, C = t.shape
    return t.reshape(B, L, num_heads, C // num_heads).transpose(0, 2, 1, 3)


class GLIDEAttentionBlock(nn.Module):
    """Self-attention with optional prepended encoder K/V; cf.
    ``layout_unet_v1.py:245-345`` + ``QKVAttentionLegacy:555-592``."""

    num_heads: int
    encoder_channels: int | None = None

    @nn.compact
    def __call__(self, x, cond_kwargs=None):
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, name="qkv")(gn32(name="norm")(tokens))
        # torch packs per-head [q|k|v] blocks: reshape (B, L, heads, 3dh)
        qkv = qkv.reshape(B, H * W, self.num_heads, -1)
        dh = C // self.num_heads
        q, k, v = jnp.split(qkv, [dh, 2 * dh], axis=-1)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))  # (B, h, L, dh)
        if cond_kwargs is not None and self.encoder_channels is not None:
            ekv = nn.Dense(2 * C, name="encoder_kv")(cond_kwargs["xf_out"])
            ekv = ekv.reshape(B, -1, self.num_heads, 2 * dh)
            ek, ev = jnp.split(ekv, 2, axis=-1)
            k = jnp.concatenate([ek.transpose(0, 2, 1, 3), k], axis=2)
            v = jnp.concatenate([ev.transpose(0, 2, 1, 3), v], axis=2)
        # python float (weak type): an np scalar would promote bf16 q/k -
        # and the whole logits array - to f32 (measured at the HBM roof)
        scale = float(1.0 / np.sqrt(np.sqrt(dh)))
        if use_fused_attention(H * W):
            out = attention_bhld(q * scale, k * scale, v)
        else:
            logits = jnp.einsum("bhtc,bhsc->bhts", q * scale, k * scale)
            w = softmax_f32_math(logits)
            out = jnp.einsum("bhts,bhsc->bhtc", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H * W, C)
        out = nn.Dense(C, kernel_init=nn.initializers.zeros, name="proj_out")(out)
        return (tokens + out).reshape(B, H, W, C)


class ObjectAwareCrossAttention(nn.Module):
    """Image-patch + layout joint attention; cf. ``layout_unet_v1.py:347-532``.

    Queries = image content ⊕ patch positional embedding; keys = the same for
    image tokens and layout content ⊕ layout positional embedding for layout
    tokens; values carry content only.
    """

    num_heads: int
    encoder_channels: int
    resolution: int  # feature_map_size[0] // ds — keys the patch embedding
    channels_scale_for_positional_embedding: float = 1.0
    norm_first: bool = False
    norm_for_obj_embedding: bool = False

    @nn.compact
    def __call__(self, x, cond_kwargs):
        B, H, W, C = x.shape
        nh = self.num_heads
        pe_ch = int(C * self.channels_scale_for_positional_embedding)
        tokens = x.reshape(B, H * W, C)

        qkv = nn.Dense(3 * C, name="qkv_projector")(gn32(name="norm_for_qkv")(tokens))
        # unlike QKVAttentionLegacy's per-head packing, the reference OACA
        # splits the fused projection at full-channel granularity
        # (layout_unet_v1.py:442: qkv.split(C, dim=1)), then blocks per head
        q_c, k_c, v_c = (
            _split_heads(t, nh) for t in jnp.split(qkv, 3, axis=-1)
        )

        pos_proj = nn.Dense(pe_ch, name="layout_position_embedding_projector")
        patch_raw = cond_kwargs[
            f"image_patch_bbox_embedding_for_resolution{self.resolution}"
        ]  # (B, L1, enc_ch)
        if self.norm_first:
            ipe = pos_proj(gn32(name="norm_for_image_patch_positional_embedding")(patch_raw))
        else:
            ipe = gn32(name="norm_for_image_patch_positional_embedding")(pos_proj(patch_raw))
        ipe = _split_heads(ipe, nh)  # (B, h, L1, pe/h)

        lpe_raw = cond_kwargs["obj_bbox_embedding"]  # (B, L2, enc_ch)
        if self.norm_first:
            lpe = pos_proj(gn32(name="norm_for_layout_positional_embedding")(lpe_raw))
        else:
            lpe = gn32(name="norm_for_layout_positional_embedding")(pos_proj(lpe_raw))
        lpe = _split_heads(lpe, nh)

        cls_n = gn32(name="norm_for_obj_class_embedding")(cond_kwargs["obj_class_embedding"])
        if self.norm_for_obj_embedding:
            xf = gn32(name="norm_for_obj_embedding_gn")(cond_kwargs["xf_out"])
        else:
            xf = cond_kwargs["xf_out"]
        layout_content = (xf + cls_n) / 2
        kv_l = nn.Dense(2 * C, name="layout_content_embedding_projector")(layout_content)
        k_lc, v_lc = jnp.split(kv_l, 2, axis=-1)
        k_l = jnp.concatenate([_split_heads(k_lc, nh), lpe], axis=-1)
        v_l = _split_heads(v_lc, nh)

        scale = float(1.0 / np.sqrt(np.sqrt(
            int((1 + self.channels_scale_for_positional_embedding) * C) // nh
        )))  # python float: np scalars promote bf16 logits to f32
        if use_fused_attention(H * W):
            # split-strip kernel: q/k concats, scale pre-multiplies and the
            # kv pad never materialize in HBM (they cost 27+23+4 ms per
            # 50-step flagship call as XLA ops, round-4 trace)
            out = oaca_attention(q_c, ipe, k_c, k_l, v_c, v_l, scale=scale)
        else:
            q_img = jnp.concatenate([q_c, ipe], axis=-1)
            k_img = jnp.concatenate([k_c, ipe], axis=-1)
            k_mix = jnp.concatenate([k_img, k_l], axis=2)  # (B, h, L1+L2, (1+s)dh)
            v_mix = jnp.concatenate([v_c, v_l], axis=2)
            logits = jnp.einsum("bhtc,bhsc->bhts", q_img * scale, k_mix * scale)
            w = softmax_f32_math(logits)
            out = jnp.einsum("bhts,bhsc->bhtc", w, v_mix)
        out = out.transpose(0, 2, 1, 3).reshape(B, H * W, C)
        out = nn.Dense(C, kernel_init=nn.initializers.zeros, name="proj_out")(out)
        return (tokens + out).reshape(B, H, W, C)


class LayoutUnetV1(nn.Module):
    """cf. ``layout_unet_v1.py:599-901``; NHWC, ``__call__(x, cond_dict)``.

    ``cond_dict`` = {'time_condition': (B,), 'other_condition': encoder outputs}.
    """

    in_channels: int
    resolution: tuple[int, int]
    model_channels: int = 64
    out_channels: int = 2
    num_res_blocks: int = 2
    attention_ds: Sequence[int] = (4, 8)
    encoder_channels: int | None = 64
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = -1
    num_head_channels: int = 32
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    image_size: int = 32
    attention_block_type: str = "ObjectAwareCrossAttention"
    num_attention_blocks: int = 1
    use_key_padding_mask: bool = False
    channels_scale_for_positional_embedding: float = 1.0
    norm_first: bool = False
    norm_for_obj_embedding: bool = False
    coords_encoding: str | None = "fourier_features"
    use_positional_embedding_for_attention: bool = True
    ring: bool = True
    fir_updown: bool = True  # False = v0 nearest/avg-pool updown ResBlocks
    adm_time_embed: bool = False  # True = v0 functional timestep_embedding
    use_concat_cond: bool = True  # v0 forward has no concat_cond input
    use_ray_angle_coords: bool = False
    fov_up: float = 10.0
    fov_down: float = -30.0

    def _heads(self, ch: int, upsample: bool = False) -> int:
        if self.num_head_channels == -1:
            n = self.num_heads_upsample if (upsample and self.num_heads_upsample != -1) else self.num_heads
            return max(n, 1)
        return ch // self.num_head_channels

    def _attn(self, ch: int, ds: int, upsample: bool, name: str):
        if self.attention_block_type == "ObjectAwareCrossAttention":
            return ObjectAwareCrossAttention(
                num_heads=self._heads(ch, upsample),
                encoder_channels=self.encoder_channels,
                resolution=int(self.image_size // ds),
                channels_scale_for_positional_embedding=self.channels_scale_for_positional_embedding,
                norm_first=self.norm_first,
                norm_for_obj_embedding=self.norm_for_obj_embedding,
                name=name,
            )
        return GLIDEAttentionBlock(
            num_heads=self._heads(ch, upsample),
            encoder_channels=self.encoder_channels,
            name=name,
        )

    @nn.compact
    def __call__(self, x, cond_dict, deterministic: bool = True):
        timesteps = cond_dict["time_condition"]
        layout = cond_dict["other_condition"]
        B = x.shape[0]
        if timesteps.ndim == 0:
            timesteps = jnp.full((B,), timesteps)

        temb_dim = self.model_channels * 4
        emb = TimeEmbedding(
            self.model_channels, temb_dim, adm=self.adm_time_embed, name="time_embed"
        )(timesteps)
        emb = emb + layout["xf_proj"].astype(emb.dtype)
        # keep bf16 inference bf16: the f32 sinusoid would otherwise promote
        # every ResBlock scale/shift - and the whole conv path - to f32
        emb = emb.astype(x.dtype)

        h = x
        if self.use_concat_cond and "concat_cond" in layout:
            h = jnp.concatenate([h, layout["concat_cond"]], axis=-1)

        if self.coords_encoding is not None:
            if self.use_ray_angle_coords:
                coords = get_linear_ray_angles_np(
                    *self.resolution, fov_up=self.fov_up, fov_down=self.fov_down
                )
            else:
                coords = enc.generate_polar_coords(*self.resolution).astype(np.float64)
            cenc = enc.encode_coords(coords, self.coords_encoding, self.resolution)
            cenc = jnp.broadcast_to(
                jnp.asarray(cenc, h.dtype)[None], (B, *cenc.shape)
            )
            h = jnp.concatenate([h, cenc], axis=-1)

        def res(ch, name, **kw):
            return ResBlockADM(
                out_channels=ch,
                dropout=self.dropout,
                use_scale_shift_norm=self.use_scale_shift_norm,
                ring=self.ring,
                fir=self.fir_updown,
                name=name,
                **kw,
            )

        ch = int(self.channel_mult[0] * self.model_channels)
        h = RingConv(ch, ring=self.ring, name="in_conv")(h)
        hs = [h]
        ds = 1
        # encoder
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = res(ch, f"in_{level}_{i}_res")(h, emb, deterministic)
                if ds in self.attention_ds:
                    for a in range(self.num_attention_blocks):
                        h = self._attn(ch, ds, False, f"in_{level}_{i}_attn{a}")(h, layout)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(ch, f"down_{level}", down=True)(h, emb, deterministic)
                else:
                    h = Downsample(ch, self.conv_resample, ring=self.ring, name=f"down_{level}")(h)
                hs.append(h)
                ds *= 2

        # middle
        h = res(ch, "mid_res1")(h, emb, deterministic)
        h = self._attn(ch, ds, False, "mid_attn")(h, layout)
        h = res(ch, "mid_res2")(h, emb, deterministic)

        # decoder
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                ch = int(self.model_channels * mult)
                h = res(ch, f"out_{level}_{i}_res")(h, emb, deterministic)
                if ds in self.attention_ds:
                    for a in range(self.num_attention_blocks):
                        h = self._attn(ch, ds, True, f"out_{level}_{i}_attn{a}")(h, layout)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res(ch, f"up_{level}", up=True)(h, emb, deterministic)
                    else:
                        h = Upsample(ch, self.conv_resample, ring=self.ring, name=f"up_{level}")(h)
                    ds //= 2

        h = gn32(name="out_norm")(h, silu=True)
        return RingConv(
            self.out_channels, ring=self.ring, zero_init=True, name="out_conv"
        )(h)


class LayoutUnet(LayoutUnetV1):
    """Faithful v0 variant (registry key ``layout_unet``); cf.
    ``lidargen/models/unets/layout_unet.py:97-235,600-880``.

    Differs from V1 in exactly the ways the reference modules differ:
    plain zero-padded convs (no azimuth ring), ADM ``h_upd``/``x_upd``
    resampling in up/down ResBlocks (2x nearest / 2x2 avg-pool instead of the
    FIR ``ops.Resample``), the functional ADM ``timestep_embedding`` sinusoid
    ahead of a 2-Linear MLP (``layout_unet.py:915``; state-dict keys
    ``time_embed.0/2`` instead of V1's ``time_embed.1/3``), a fixed 32x1024
    resolution, and no coords-encoding or ``concat_cond`` input concat
    (``layout_unet.py:848-880`` forward).  Drives the ``nuscenes-box-layout``
    config (``option_nusc_box_layout.py:7``).
    """

    resolution: tuple[int, int] = (32, 1024)
    ring: bool = False
    fir_updown: bool = False
    adm_time_embed: bool = True
    use_concat_cond: bool = False
    coords_encoding: str | None = None
