"""HDiT: hourglass diffusion transformer backbone (flax / NHWC).

TPU-native re-design of ``lidargen/models/dits/hdit.py`` (652 LoC, k-diffusion
image_transformer_v2 derived):

- ``CircularNeighborhoodSelfAttention`` (``hdit.py:164-256``): the reference
  uses the natten CUDA kernels; here the clamped neighborhood windows are
  static gather indices (circular on the azimuth axis, clamped on elevation)
  and attention is a dense einsum over (kh·kw) keys per query — the regular,
  MXU-friendly formulation of local attention;
- AxialRoPE with harmonic-limited frequencies (``hdit.py:66-95``);
- cosine-attention q/k normalization with learnable per-head log scale
  (``:120-124``);
- AdaRMSNorm conditioning, GEGLU FFNs, PatchMerging/Expanding with learnable
  lerp (``:258-282``), RandomFourierFeatures + mapping network time embedding.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import encoding as enc
from .ops import softmax_f32_math


def rms_norm(x, scale=None, eps=1e-6):
    x32 = x.astype(jnp.float32)
    normed = x32 * jax.lax.rsqrt(jnp.mean(x32**2, axis=-1, keepdims=True) + eps)
    if scale is not None:
        normed = normed * scale
    return normed.astype(x.dtype)


class RMSNorm(nn.Module):
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        scale = (
            self.param("scale", nn.initializers.ones, (x.shape[-1],))
            if self.use_scale
            else None
        )
        return rms_norm(x, scale)


class AdaRMSNorm(nn.Module):
    """RMSNorm × (1 + zero-init proj(emb)); cf. ``hdit.py:46-59``."""

    @nn.compact
    def __call__(self, x, emb):
        proj = nn.Dense(
            x.shape[-1], use_bias=False, kernel_init=nn.initializers.zeros,
            name="proj",
        )(emb)
        return rms_norm(x) * (1 + proj[:, None, None, :])


def rope_freqs(head_dim: int, num_heads: int, max_harmonic: int) -> np.ndarray:
    """cf. ``hdit.py:67-78``: linspace in log-frequency, rounded to integers,
    reshaped (dim//4, heads) → (heads, dim//4)."""
    n = num_heads * head_dim // 4
    f = np.exp(np.linspace(math.log(1.0), math.log(max(max_harmonic, 1)), n))
    return np.round(f).reshape(head_dim // 4, num_heads).T  # (heads, dim//4)


def axial_rope_theta(coords, freqs_h, freqs_w):
    """coords (H, W, 2) [phi, theta] → (H, W, heads, dim//2) radians."""
    rad_h = coords[..., None, 0:1] * freqs_h.T[None, None]  # (H,W,d/4,heads)? fix below
    # coords[..., 0] (H, W); freqs (heads, d/4)
    rad_h = coords[..., 0][..., None, None] * freqs_h[None, None]  # (H,W,heads,d/4)
    rad_w = coords[..., 1][..., None, None] * freqs_w[None, None]
    return jnp.concatenate([rad_h, rad_w], axis=-1)  # (H,W,heads,d/2)


def rope_rotate(x, theta):
    """Rotate the first 2·|theta| channels; cf. ``hdit.py:88-93,126-132``."""
    d = theta.shape[-1] * 2
    xr, rest = x[..., :d], x[..., d:]
    x1, x2 = jnp.split(xr, 2, axis=-1)
    y1 = x1 * jnp.cos(theta) - x2 * jnp.sin(theta)
    y2 = x1 * jnp.sin(theta) + x2 * jnp.cos(theta)
    return jnp.concatenate([y1, y2, rest], axis=-1)


def _neighborhood_indices(H: int, W: int, kh: int, kw: int, circular_w: bool):
    """Static (H, W, kh*kw, 2) neighbor coordinates with natten clamped-window
    semantics on H and circular wrap on W."""
    hs = np.arange(H)
    start_h = np.clip(hs - kh // 2, 0, max(H - kh, 0))
    nh = start_h[:, None] + np.arange(kh)[None]  # (H, kh)
    ws = np.arange(W)
    if circular_w:
        nw = (ws[:, None] - kw // 2 + np.arange(kw)[None]) % W  # (W, kw)
    else:
        start_w = np.clip(ws - kw // 2, 0, max(W - kw, 0))
        nw = start_w[:, None] + np.arange(kw)[None]
    hh = np.broadcast_to(nh[:, None, :, None], (H, W, kh, kw))
    ww = np.broadcast_to(nw[None, :, None, :], (H, W, kh, kw))
    return hh.reshape(H, W, kh * kw), ww.reshape(H, W, kh * kw)


class SelfAttention(nn.Module):
    """Global or circular-neighborhood attention; cf. ``hdit.py:98-256``."""

    num_heads: int
    rope_max_harmonics: tuple[int, int] = (1, 1)
    kernel_size: tuple[int, int] | None = None  # None → global
    dropout: float = 0.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, coords, emb, deterministic: bool = True):
        B, H, W, C = x.shape
        nh = self.num_heads
        dh = C // nh
        h = AdaRMSNorm(name="norm")(x, emb)
        qkv = nn.Dense(3 * C, use_bias=False, name="qkv_proj")(h)
        qkv = qkv.reshape(B, H, W, 3, nh, dh)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]

        log_scale = self.param(
            "scale", lambda *_: jnp.full((nh, 1), math.log(10.0)), (nh, 1)
        )
        scale = jnp.sqrt(jnp.exp(jnp.clip(log_scale, max=math.log(100.0))))

        def normalize(t):
            t32 = t.astype(jnp.float32)
            t32 = t32 / jnp.clip(
                jnp.linalg.norm(t32, axis=-1, keepdims=True), min=self.eps
            )
            return (t32 * scale).astype(t.dtype)

        q, k = normalize(q), normalize(k)

        fh = jnp.asarray(
            rope_freqs(dh, nh, self.rope_max_harmonics[0]), jnp.float32
        )
        fw = jnp.asarray(
            rope_freqs(dh, nh, self.rope_max_harmonics[1]), jnp.float32
        )
        theta = axial_rope_theta(coords, fh, fw)  # (H, W, nh, dh/2)
        q = rope_rotate(q, theta[None])
        k = rope_rotate(k, theta[None])

        if self.kernel_size is None:
            qf = q.reshape(B, H * W, nh, dh).transpose(0, 2, 1, 3)
            kf = k.reshape(B, H * W, nh, dh).transpose(0, 2, 1, 3)
            vf = v.reshape(B, H * W, nh, dh).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhtd,bhsd->bhts", qf, kf)
            w = softmax_f32_math(logits)
            out = jnp.einsum("bhts,bhsd->bhtd", w, vf)
            out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        else:
            kh, kw = self.kernel_size
            hh, ww = _neighborhood_indices(H, W, kh, kw, circular_w=True)
            hh, ww = jnp.asarray(hh), jnp.asarray(ww)
            k_n = k[:, hh, ww]  # (B, H, W, K, nh, dh)
            v_n = v[:, hh, ww]
            logits = jnp.einsum("bhwnd,bhwknd->bhwnk", q, k_n)
            w = softmax_f32_math(logits)
            out = jnp.einsum("bhwnk,bhwknd->bhwnd", w, v_n).reshape(B, H, W, C)

        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        out = nn.Dense(
            C, use_bias=False, kernel_init=nn.initializers.zeros, name="out_proj"
        )(out)
        return x + out


class GEGLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.features * 2, use_bias=False)(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """AdaRMSNorm → GEGLU → zero-init Dense, residual; cf. ``hdit.py:339-355``."""

    mid_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = AdaRMSNorm(name="adarms")(x, emb)
        h = GEGLU(self.mid_dim, name="gegelu")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(
            x.shape[-1], use_bias=False, kernel_init=nn.initializers.zeros,
            name="linear",
        )(h)
        return x + h


class HDiTBlock(nn.Module):
    num_heads: int
    attn_type: str = "global"
    kernel_size: tuple[int, int] | None = None
    rope_max_harmonics: tuple[int, int] = (1, 1)
    mlp_ratio: float = 3.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, coords, emb, deterministic: bool = True):
        x = SelfAttention(
            num_heads=self.num_heads,
            rope_max_harmonics=self.rope_max_harmonics,
            kernel_size=self.kernel_size if self.attn_type == "local" else None,
            dropout=self.dropout,
            name="attn",
        )(x, coords, emb, deterministic)
        x = FeedForward(
            mid_dim=int(x.shape[-1] * self.mlp_ratio), dropout=self.dropout, name="ffn"
        )(x, emb, deterministic)
        return x


class MappingNetwork(nn.Module):
    """RMSNorm → N×(residual GEGLU mlp) → RMSNorm; cf. ``hdit.py:416-445``."""

    mid_dim: int
    depth: int = 2

    @nn.compact
    def __call__(self, x):
        x = RMSNorm(name="norm_in")(x)
        for i in range(self.depth):
            h = RMSNorm(name=f"mlp{i}_norm")(x)
            h = GEGLU(self.mid_dim, name=f"mlp{i}_gegelu")(h)
            h = nn.Dense(
                x.shape[-1], use_bias=False, kernel_init=nn.initializers.zeros,
                name=f"mlp{i}_linear",
            )(h)
            x = x + h
        return RMSNorm(name="norm_out")(x)


class HDiT(nn.Module):
    """cf. ``hdit.py:486-652``; ``__call__(x (B,H,W,C), t (B,))``."""

    resolution: tuple[int, int]
    in_channels: int
    out_channels: int | None = None
    base_channels: int = 128
    time_embed_channels: int = 256
    patch_size: tuple[int, int] = (1, 4)
    window_size: tuple[int, int] = (3, 9)
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    dilation: Sequence[int] = (1, 1, 1, 1)
    mlp_ratio: float = 3.0
    dropout: float = 0.0
    mapping_depth: int = 2
    positional_embedding: str = "learnable_embedding"
    ring: bool = True
    rff_std: float = 1.0
    # factory-compat (coords are polar by construction, cf. hdit.py:518)
    use_ray_angle_coords: bool = False
    fov_up: float = 10.0
    fov_down: float = -30.0

    @nn.compact
    def __call__(self, x, t, deterministic: bool = True):
        B = x.shape[0]
        if t.ndim == 0:
            t = jnp.full((B,), t)
        H, W = self.resolution
        ph, pw = self.patch_size
        th, tw = H // ph, W // pw

        # timestep: random Fourier features + mapping (cf. :407-413,542-549)
        freqs = self.param(
            "rff_freqs",
            lambda key, shape: jax.random.normal(key, shape) * self.rff_std,
            (self.time_embed_channels // 2,),
        )
        freqs = jax.lax.stop_gradient(freqs)  # buffer in the reference
        ang = t[:, None] * (2 * jnp.pi * freqs)[None]
        emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=1)
        emb = nn.Dense(self.time_embed_channels, use_bias=False, name="rff_linear")(emb)
        emb = MappingNetwork(
            int(self.time_embed_channels * self.mlp_ratio),
            depth=self.mapping_depth,
            name="timestep_mapping",
        )(emb)

        # tokenize (patch conv) + positional embedding
        h = nn.Conv(
            self.base_channels, self.patch_size, strides=self.patch_size,
            padding="VALID", use_bias=False, name="tokenizer",
        )(x)
        coords_full = jnp.asarray(
            enc.generate_polar_coords(H, W), jnp.float32
        )  # (H, W, 2)
        c = coords_full.reshape(th, ph, tw, pw, 2).mean(axis=(1, 3))  # avg pool

        if self.positional_embedding == "learnable_embedding":
            pe = self.param(
                "spatial_pe",
                nn.initializers.truncated_normal(0.02),
                (1, th, tw, self.base_channels),
            )
            h = h + pe
        elif self.positional_embedding is not None:
            pemb = enc.encode_coords(
                np.asarray(c, np.float64), self.positional_embedding, (th, tw)
            )
            pemb = nn.Dense(self.base_channels, use_bias=False, name="ape_linear")(
                jnp.asarray(pemb, h.dtype)
            )
            pemb = MappingNetwork(
                int(self.base_channels * self.mlp_ratio),
                depth=self.mapping_depth,
                name="spatial_mapping",
            )(pemb)
            h = h + pemb[None]

        max_h = (max(th // 2, 1), max(tw // 2, 1))
        levels = len(self.depths) - 1
        skips = []
        for i in range(levels):
            harm = (max(max_h[0] >> i, 1), max(max_h[1] >> i, 1))
            for j in range(self.depths[i]):
                h = HDiTBlock(
                    num_heads=self.num_heads[i],
                    attn_type="local",
                    kernel_size=tuple(self.window_size),
                    rope_max_harmonics=harm,
                    mlp_ratio=self.mlp_ratio,
                    dropout=self.dropout,
                    name=f"down_{i}_{j}",
                )(h, c, emb, deterministic)
            skips.append((h, c))
            c = c.reshape(c.shape[0] // 2, 2, c.shape[1] // 2, 2, 2).mean(axis=(1, 3))
            # PatchMerging (cf. :258-263)
            Bh, Hh, Wh, Ch = h.shape
            h = h.reshape(Bh, Hh // 2, 2, Wh // 2, 2, Ch)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(Bh, Hh // 2, Wh // 2, 4 * Ch)
            h = nn.Dense(2 * Ch, use_bias=False, name=f"merge_{i}")(h)

        harm = (max(max_h[0] >> levels, 1), max(max_h[1] >> levels, 1))
        for j in range(self.depths[-1]):
            h = HDiTBlock(
                num_heads=self.num_heads[-1],
                attn_type="global",
                rope_max_harmonics=harm,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                name=f"mid_{j}",
            )(h, c, emb, deterministic)

        for i in reversed(range(levels)):
            h_skip, c = skips.pop()
            # PatchExpanding with learnable lerp (cf. :266-278)
            Bh, Hh, Wh, Ch = h.shape
            h = nn.Dense(2 * Ch, use_bias=False, name=f"expand_{i}_linear")(h)
            h = h.reshape(Bh, Hh, Wh, 2, 2, Ch // 2)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(Bh, Hh * 2, Wh * 2, Ch // 2)
            alpha = self.param(
                f"expand_{i}_alpha", nn.initializers.zeros, (Ch // 2,)
            )
            a = nn.sigmoid(alpha)
            h = h_skip + (h - h_skip) * a
            harm = (max(max_h[0] >> i, 1), max(max_h[1] >> i, 1))
            for j in range(self.depths[i]):
                h = HDiTBlock(
                    num_heads=self.num_heads[i],
                    attn_type="local",
                    kernel_size=tuple(self.window_size),
                    rope_max_harmonics=harm,
                    mlp_ratio=self.mlp_ratio,
                    dropout=self.dropout,
                    name=f"up_{i}_{j}",
                )(h, c, emb, deterministic)

        # detokenize (cf. :286-307)
        h = RMSNorm(name="detok_norm")(h)
        out_ch = self.out_channels or self.in_channels
        h = nn.Dense(
            out_ch * ph * pw, use_bias=False, kernel_init=nn.initializers.zeros,
            name="detok_linear",
        )(h)
        h = h.reshape(B, th, tw, ph, pw, out_ch)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, out_ch)
        return h
