"""1D UNet over the object axis for layout diffusion (flax).

TPU-native re-design of ``lidargen/models/unets/unet_1d.py:368-717``
(``UNet1DModel``).  In the reference each object/node is a length-1 "sequence"
(``forward:704``: box_t (N, 20) → (N, 20, 1)); its Conv1d(k=3, pad=1) layers
therefore only ever use the middle kernel tap, its ``Upsample`` interpolates
with scale factor 1 (``unet_1d.py:88``) and its strided ``Downsample`` reduces
to the same middle tap — so the whole UNet is mathematically a per-node MLP
with FiLM time conditioning and single-token LDM cross-attention
(``attention.py:154-219,353-420``), plus a graph message-passing stage over box
triples (``box_messsage_passing:691-705``).  This module implements exactly
that computation with Dense layers (torch ckpt ingestion takes kernel[..., 1]).

Inputs follow the reference's flat node batch: ``box_t`` (N, in_channels),
``cond_dict = {'time_condition': (N,), 'other_condition': {'preds': (T, 3),
'uc_b': (N, Dobj), 'edge_mask': (T,)}}``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from .graph import GraphTripleConvNet
from .ops import GroupNorm32, sinusoidal_embedding


def gn32(name=None):
    # direct-variance GroupNorm: flax's E[x^2]-E[x]^2 form cancels
    # catastrophically on small groups (see ops.GroupNorm32)
    return GroupNorm32(num_groups=32, epsilon=1e-5, name=name)


class ResBlock1D(nn.Module):
    """ADM ResBlock at sequence length 1; cf. ``unet_1d.py:93-207``."""

    out_channels: int
    use_scale_shift_norm: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = gn32(name="in_norm")(x)
        h = nn.silu(h)
        h = nn.Dense(self.out_channels, name="in_conv")(h)
        emb_ch = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = nn.Dense(emb_ch, name="emb_proj")(nn.silu(emb))
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = gn32(name="out_norm")(h) * (1 + scale) + shift
        else:
            h = h + emb_out
            h = gn32(name="out_norm")(h)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.out_channels, kernel_init=nn.initializers.zeros, name="out_conv")(h)
        if in_ch != self.out_channels:
            x = nn.Dense(self.out_channels, name="skip")(x)
        return x + h


class SingleTokenCrossAttention(nn.Module):
    """LDM CrossAttention at 1 query / 1 key token; cf. ``attention.py:154-219``.

    softmax over a single key is identity, so out = to_out(v(context)).
    Kept in full form for weight-compatible generality.
    """

    heads: int
    dim_head: int
    context_dim: int | None = None

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        if context is None:
            context = x
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)
        # single-token softmax == 1 → q/k only matter for >1 tokens; still
        # instantiate projections for checkpoint parity.
        _ = nn.Dense(inner, use_bias=False, name="to_q")(x)
        _ = nn.Dense(inner, use_bias=False, name="to_k")(context)
        return nn.Dense(x.shape[-1], name="to_out")(v)


class GEGLUFeedForward(nn.Module):
    """cf. LDM FeedForward with GEGLU."""

    mult: int = 4

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        proj = nn.Dense(inner * 2, name="geglu")(x)
        a, gate = jnp.split(proj, 2, axis=-1)
        return nn.Dense(dim, name="proj_out")(a * nn.gelu(gate, approximate=False))


class TransformerBlock1Token(nn.Module):
    """BasicTransformerBlock at 1 token; cf. ``attention.py:222-250``."""

    heads: int
    dim_head: int
    context_dim: int

    @nn.compact
    def __call__(self, x, context):
        x = x + SingleTokenCrossAttention(self.heads, self.dim_head, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        )
        x = x + SingleTokenCrossAttention(
            self.heads, self.dim_head, self.context_dim, name="attn2"
        )(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        x = x + GEGLUFeedForward(name="ff")(nn.LayerNorm(epsilon=1e-5, name="norm3")(x))
        return x


class SpatialTransformer1Token(nn.Module):
    """cf. ``attention.py:353-420`` at sequence length 1."""

    heads: int
    dim_head: int
    context_dim: int
    depth: int = 1

    @nn.compact
    def __call__(self, x, context):
        x_in = x
        # LDM Normalize uses eps=1e-6 (attention.py:78-79), unlike the ADM
        # resblock GroupNorm32 (1e-5)
        h = GroupNorm32(num_groups=32, epsilon=1e-6, name="norm")(x)
        h = nn.Dense(self.heads * self.dim_head, name="proj_in")(h)
        for d in range(self.depth):
            h = TransformerBlock1Token(
                self.heads, self.dim_head, self.context_dim, name=f"block{d}"
            )(h, context)
        h = nn.Dense(x.shape[-1], kernel_init=nn.initializers.zeros, name="proj_out")(h)
        return h + x_in


class UNet1DModel(nn.Module):
    """cf. ``unet_1d.py:368-717``; per-node layout denoiser + box GCN."""

    in_channels: int = 20
    model_channels: int = 512
    out_channels: int = 20
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 1, 1, 1)
    num_heads: int = 8
    use_spatial_transformer: bool = True
    transformer_depth: int = 1
    conditioning_key: str = "crossattn"
    concat_dim: int = 1280
    crossattn_dim: int = 1280
    using_clip: bool = True
    enable_t_emb: bool = True
    gconv_dim: int = 64

    @property
    def resolution(self):
        return (1,)

    def box_message_passing(self, box_t, obj_embed, triples, edge_mask, t_emb,
                            use_running_average=True):
        """cf. ``unet_1d.py:691-705``."""
        s, p, o = triples[:, 0], triples[:, 1], triples[:, 2]
        edges = jnp.stack([s, o], axis=1)
        box_embed = nn.Dense(
            self.gconv_dim, kernel_init=nn.initializers.kaiming_normal(),
            name="box_embeddings",
        )(box_t)
        pred_embed = nn.Embed(16, self.gconv_dim * 2, name="pred_embeddings")(p)
        obj_box = jnp.concatenate([obj_embed, box_embed], axis=1)
        if self.enable_t_emb:
            obj_box = jnp.concatenate(
                [obj_box, nn.Dense(self.gconv_dim, name="box_time_emb")(t_emb)], axis=1
            )
        add_dim = 512 if self.using_clip else 0
        out, _ = GraphTripleConvNet(
            input_dim_obj=self.gconv_dim * 2 + add_dim + self.gconv_dim
            + (self.gconv_dim if self.enable_t_emb else 0),
            input_dim_pred=self.gconv_dim * 2,
            hidden_dim=self.gconv_dim * 4,
            pooling="avg",
            num_layers=5,
            mlp_normalization="batch",
            residual=True,
            output_dim=self.concat_dim,
            name="box_graph_cov",
        )(obj_box, pred_embed, edges, edge_mask, use_running_average)
        return out

    @nn.compact
    def __call__(self, box_t, cond_dict, deterministic: bool = True,
                 use_running_average: bool = True):
        timesteps = cond_dict["time_condition"]
        layout = cond_dict["other_condition"]
        N = box_t.shape[0]
        if timesteps.ndim == 0:
            timesteps = jnp.full((N,), timesteps)

        temb_dim = self.model_channels * 4
        # reference: time_embed(timestep_embedding(t, model_channels)) with
        # cos-first embedding (nn.py:114-131)
        half = self.model_channels // 2
        freqs = jnp.exp(
            -np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = timesteps[:, None].astype(jnp.float32) * freqs[None]
        sinu = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        emb = nn.Dense(temb_dim, name="time_embed0")(sinu)
        emb = nn.silu(emb)
        emb = nn.Dense(temb_dim, name="time_embed1")(emb)

        context_nodes = self.box_message_passing(
            box_t,
            layout["uc_b"],
            layout["preds"],
            layout.get("edge_mask"),
            emb,
            use_running_average,
        )  # (N, concat_dim)

        h = box_t[:, None, :]  # (N, 1, C) — single-token sequence
        context = context_nodes[:, None, :]
        if self.conditioning_key in ("concat", "hybrid"):
            h = jnp.concatenate([h, context], axis=-1)

        dim_head = None
        def make_attn(ch, name):
            heads = self.num_heads
            dh = ch // heads
            return SpatialTransformer1Token(
                heads, dh, self.crossattn_dim, depth=self.transformer_depth, name=name
            )

        def res(ch, name):
            return ResBlock1D(
                out_channels=ch, use_scale_shift_norm=False, dropout=self.dropout,
                name=name,
            )

        ch = self.model_channels
        h = nn.Dense(ch, name="in_conv")(h)
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = mult * self.model_channels
                h = res(ch, f"in_{level}_{i}_res")(h, emb[:, None, :], deterministic)
                if ds in self.attention_resolutions:
                    h = make_attn(ch, f"in_{level}_{i}_attn")(h, context)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                # strided Conv1d at L=1 ≡ Dense (middle tap)
                h = nn.Dense(ch, name=f"down_{level}")(h)
                hs.append(h)
                ds *= 2

        h = res(ch, "mid_res1")(h, emb[:, None, :], deterministic)
        h = make_attn(ch, "mid_attn")(h, context)
        h = res(ch, "mid_res2")(h, emb[:, None, :], deterministic)

        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                ch = self.model_channels * mult
                h = res(ch, f"out_{level}_{i}_res")(h, emb[:, None, :], deterministic)
                if ds in self.attention_resolutions:
                    h = make_attn(ch, f"out_{level}_{i}_attn")(h, context)
                if level and i == self.num_res_blocks:
                    # Upsample at L=1: interpolate(scale=1) + conv ≡ Dense
                    h = nn.Dense(ch, name=f"up_{level}")(h)
                    ds //= 2

        h = gn32(name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Dense(self.out_channels, kernel_init=nn.initializers.zeros, name="out_conv")(h)
        return h[:, 0, :]  # (N, out_channels)
