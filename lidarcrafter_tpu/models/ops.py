"""Shared model blocks: ring padding/conv, FIR resampling, AdaGN, attention.

TPU-native flax re-design of ``lidargen/models/unets/ops.py`` (207 LoC).  All
activations are NHWC; the azimuth axis (W) is periodic, so horizontal padding
is circular ("ring") — cf. ``ops.py:32-49``.  Under ``shard_map``/``pjit`` with
W sharded, XLA lowers the wrap-around concat and conv halos to neighbor
collective-permutes over ICI, which is the idiomatic TPU analogue of the
reference's single-GPU circular padding.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas_attention import attention_bhld, use_fused_attention
from ..ops.pallas_groupnorm import fused_group_norm, use_fused_groupnorm


def fused_attention_fn(query, key, value, bias=None, mask=None, **kwargs):
    """Drop-in ``attention_fn`` for ``nn.MultiHeadDotProductAttention`` that
    keeps the softmax logits in VMEM (``ops/pallas_attention.py``).

    flax layout (B, L, heads, head_dim) in/out; the 1/sqrt(d) scaling is
    applied two-sided as 1/sqrt(sqrt(d)) on q AND k (same product, keeps
    bf16 operands in range).  The kernel has no bias/mask support — our
    blocks never pass them; fail loudly rather than silently dropping one.
    """
    if bias is not None or mask is not None:
        raise NotImplementedError("fused_attention_fn: bias/mask unsupported")
    d = query.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    q = jnp.transpose(query, (0, 2, 1, 3)) * scale
    k = jnp.transpose(key, (0, 2, 1, 3)) * scale
    v = jnp.transpose(value, (0, 2, 1, 3))
    out = attention_bhld(q, k, v, interpret=kwargs.get("interpret", False))
    return jnp.transpose(out, (0, 2, 1, 3))


def ring_pad(
    x: jnp.ndarray, pad: int | tuple[int, int, int, int], ring: bool = True
) -> jnp.ndarray:
    """Pad NHWC: circular on W if ``ring``, zeros on H; cf. ``ops.py:32-49``.

    ``pad`` is (left, right, top, bottom) or a single int for all sides.
    """
    if isinstance(pad, int):
        left = right = top = bottom = pad
    else:
        left, right, top, bottom = pad
    w_mode = "wrap" if ring else "constant"
    x = jnp.pad(x, ((0, 0), (0, 0), (left, right), (0, 0)), mode=w_mode)
    x = jnp.pad(x, ((0, 0), (top, bottom), (0, 0), (0, 0)), mode="constant")
    return x


def sinusoidal_embedding(
    x: jnp.ndarray, channels: int, max_period: int = 10_000
) -> jnp.ndarray:
    """Sinusoidal timestep embedding; cf. ``ops.py:14-29``.  ``x``: (B,)."""
    half = channels // 2
    freqs = jnp.exp(
        -math.log(max_period) / (half - 1) * jnp.arange(half, dtype=jnp.float32)
    )
    h = x[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(h), jnp.cos(h)], axis=-1)


def adm_timestep_embedding(
    x: jnp.ndarray, channels: int, max_period: int = 10_000
) -> jnp.ndarray:
    """ADM/GLIDE sinusoidal embedding; cf. ``nn.py:114-132``
    (``timestep_embedding``).  Differs from :func:`sinusoidal_embedding` in
    the frequency denominator (``half`` not ``half - 1``) and the concat
    order ([cos, sin])."""
    half = channels // 2
    freqs = jnp.exp(
        -math.log(max_period) / half * jnp.arange(half, dtype=jnp.float32)
    )
    h = x[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.cos(h), jnp.sin(h)], axis=-1)


class RingConv(nn.Module):
    """3x3 (or kxk) conv with circular W padding; cf. ``ops.py:149-173``."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    padding: int = 1
    stride: int = 1
    ring: bool = False
    use_bias: bool = True
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Zero-padding on H folds into the conv (fused by XLA); only the
        # circular azimuth wrap materializes (one small concat of edge slices)
        # instead of two full padded copies.  (An edge-column-correction
        # variant that avoids the wrap copy entirely was measured SLOWER —
        # the per-conv column scatters break XLA fusion; keep the concat.)
        p = self.padding
        conv_padding = ((p, p), (0, 0)) if p != 0 else "VALID"
        if p != 0:
            if self.ring:
                x = jnp.concatenate([x[:, :, -p:], x, x[:, :, :p]], axis=2)
            else:
                conv_padding = ((p, p), (p, p))
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=(self.stride, self.stride),
            padding=conv_padding,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=nn.initializers.zeros,
        )(x)


class Resample(nn.Module):
    """FIR up/down-sampling with window [1,3,3,1]; cf. ``ops.py:52-146``.

    Zero-insertion upsampling / stride-slice downsampling around a separable
    depthwise FIR filter, with circular padding on W when ``ring``.
    """

    up: int = 1
    down: int = 1
    window: Sequence[float] = (1.0, 3.0, 3.0, 1.0)
    ring: bool = True
    normalize: bool = True

    def setup(self):
        k = jnp.asarray(self.window, dtype=jnp.float32)
        if self.normalize:
            k = k / jnp.sum(k)
        k = k * (self.up * self.up) ** 0.5  # gain per 1D application
        self.kernel = k
        n_taps = len(self.window)
        if self.up > 1:
            self.p0 = (n_taps - self.up + 1) // 2 + self.up - 1
            self.p1 = (n_taps - self.up) // 2
        else:
            self.p0 = (n_taps - self.down + 1) // 2
            self.p1 = (n_taps - self.down) // 2
        self.margin = int(max(self.p0, self.p1))

    def _kernel_2d(self, C: int, dtype) -> jnp.ndarray:
        """4x4 depthwise FIR = outer product of the 1D window (exactly the
        separable two-pass composition)."""
        n = len(self.window)
        k2d = jnp.outer(self.kernel, self.kernel).reshape(n, n, 1, 1)
        return jnp.tile(k2d, (1, 1, 1, C)).astype(dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """One depthwise conv per call: zero-insertion upsampling rides the
        conv's ``lhs_dilation`` and downsampling its ``window_strides`` — no
        4x-size zero-inserted intermediate and no second separable pass.  The
        sampler is HBM-bandwidth-bound (~13 GB/step measured), so resample
        traffic is first-order; the math is identical to the reference's
        pad→insert→FIR→stride pipeline (``ops.py:52-146``)."""
        B, H, W, C = x.shape
        m, up, down = self.margin, self.up, self.down
        # margin pad (circular W / zero H)
        x = ring_pad(x, (m, m, m, m), ring=self.ring)
        Hp, Wp = H + 2 * m, W + 2 * m
        kernel = self._kernel_2d(C, x.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        if up > 1:
            # padding (0, up-1) after dilation reproduces the reference's
            # trailing-zero insertion exactly; then slice the crop window
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), ((0, up - 1), (0, up - 1)),
                lhs_dilation=(up, up), dimension_numbers=dn,
                feature_group_count=C, precision=jax.lax.Precision.HIGHEST,
            )
            s = m * up - self.p0
            return y[:, s : s + H * up, s : s + W * up, :]
        # down: slice the crop window, then one strided VALID conv
        s = m - self.p0
        xs = x[:, s : Hp - m + self.p1, s : Wp - m + self.p1, :]
        return jax.lax.conv_general_dilated(
            xs, kernel, (down, down), "VALID", dimension_numbers=dn,
            feature_group_count=C, precision=jax.lax.Precision.HIGHEST,
        )


class FusedGN(nn.Module):
    """``nn.GroupNorm``-compatible module (same param names, so checkpoint
    converter paths are unchanged) that routes through the resident Mosaic
    kernel on TPU backends — one HBM read + one write, with the consumer
    scale-shift conditioning and SiLU folded into the write-back (see
    ``ops/pallas_groupnorm.py``).  The XLA fallback mirrors flax's
    fast-variance f32 math and applies the identical composition."""

    num_groups: int = 8
    epsilon: float = 1e-6
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, scale_shift=None, silu: bool = False):
        C = x.shape[-1]
        G = self.num_groups
        scale = (
            self.param("scale", nn.initializers.ones, (C,))
            if self.use_scale else None
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (C,))
            if self.use_bias else None
        )
        if use_fused_groupnorm(x, G):
            B = x.shape[0]
            gamma = (
                scale.astype(jnp.float32)
                if scale is not None else jnp.ones((C,), jnp.float32)
            )
            beta = (
                bias.astype(jnp.float32)
                if bias is not None else jnp.zeros((C,), jnp.float32)
            )
            if scale_shift is not None:
                s, t = scale_shift
                s1 = 1.0 + s.astype(jnp.float32).reshape(B, C)
                beta = beta * s1 + t.astype(jnp.float32).reshape(B, C)
                gamma = gamma * s1
            return fused_group_norm(
                x, gamma, beta, num_groups=G, eps=self.epsilon, silu=silu
            )
        shape = x.shape
        g = x.reshape(*shape[:-1], G, C // G).astype(jnp.float32)
        axes = tuple(range(1, g.ndim - 2)) + (g.ndim - 1,)
        mean = jnp.mean(g, axis=axes, keepdims=True)
        mean2 = jnp.mean(g * g, axis=axes, keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        y = ((g - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(shape)
        out_dtype = x.dtype
        if scale is not None:
            y = y * scale
            out_dtype = jnp.result_type(out_dtype, scale.dtype)
        if bias is not None:
            y = y + bias
            out_dtype = jnp.result_type(out_dtype, bias.dtype)
        y = y.astype(out_dtype)
        if scale_shift is not None:
            s, t = scale_shift
            y = y * (1 + s) + t
        if silu:
            y = nn.silu(y)
        return y


class AdaGN(nn.Module):
    """Adaptive GroupNorm: GN(x) * (1 + scale(emb)) + shift(emb); cf. ``ops.py:176-200``."""

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, emb: jnp.ndarray, silu: bool = False
    ) -> jnp.ndarray:
        C = x.shape[-1]
        proj = nn.Dense(C * 2)(nn.silu(emb))
        scale, shift = jnp.split(proj, 2, axis=-1)
        scale = scale[:, None, None, :]
        shift = shift[:, None, None, :]
        return FusedGN(
            num_groups=self.num_groups, epsilon=self.eps,
            use_bias=False, use_scale=False, name="GroupNorm_0",
        )(x, scale_shift=(scale, shift), silu=silu)


class SelfAttention2d(nn.Module):
    """Full self-attention over H*W tokens; cf. ``efficient_unet.py:28-58``.

    GroupNorm → MHA (out-proj zero-init) → residual → × 1/sqrt(2).
    """

    num_heads: int = 8
    gn_num_groups: int = 8
    gn_eps: float = 1e-6
    scale: float = 1.0 / math.sqrt(2.0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = FusedGN(
            num_groups=self.gn_num_groups, epsilon=self.gn_eps,
            name="GroupNorm_0",
        )(x)
        h = h.reshape(B, H * W, C)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=C,
            out_features=C,
            out_kernel_init=nn.initializers.zeros,
            attention_fn=(
                fused_attention_fn
                if use_fused_attention(H * W)
                else nn.dot_product_attention
            ),
        )(h, h)
        h = h.reshape(B, H, W, C)
        return (x + h) * self.scale


class MFSelfAttention2d(nn.Module):
    """MeanFlow attention block; cf. ``efficient_mf_unet.py:32-57``:
    GroupNorm → timm ``Attention(qkv_bias=True, qk_norm=True,
    norm_layer=RMSNorm)`` → residual → × 1/sqrt(2).

    The qk-norm is the reference's scalar-gain RMSNorm over the head dim
    (``F.normalize(x, -1) · √d · g``, ``efficient_mf_unet.py:23-30``); the
    out projection is NOT zero-initialised (timm default), unlike the base
    EfficientUNet's MHA block.
    """

    num_heads: int = 8
    gn_num_groups: int = 8
    gn_eps: float = 1e-6
    scale: float = 1.0 / math.sqrt(2.0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        nh = self.num_heads
        dh = C // nh
        h = FusedGN(
            num_groups=self.gn_num_groups, epsilon=self.gn_eps,
            name="GroupNorm_0",
        )(x)
        h = h.reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, name="qkv")(h)
        qkv = qkv.reshape(B, H * W, 3, nh, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, L, nh, dh)

        def rms(t, name):
            g = self.param(name, nn.initializers.ones, (1,))
            n = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
            return n * (dh**0.5) * g

        q = rms(q, "q_norm_g") * dh**-0.5
        k = rms(k, "k_norm_g")
        if use_fused_attention(H * W):
            out = attention_bhld(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
            ).transpose(0, 2, 1, 3).reshape(B, H * W, C)
        else:
            logits = jnp.einsum("blhd,bmhd->bhlm", q, k)
            w = nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhlm,bmhd->blhd", w, v).reshape(B, H * W, C)
        out = nn.Dense(C, name="proj")(out)
        return (x + out.reshape(B, H, W, C)) * self.scale


class ResidualBlock(nn.Module):
    """GN→SiLU→conv, AdaGN(emb)→SiLU→zero-conv, skip, × 1/sqrt(2).

    cf. ``efficient_unet.py:61-115``.
    """

    features: int
    gn_num_groups: int = 8
    gn_eps: float = 1e-6
    dropout: float = 0.0
    ring: bool = False
    scale: float = 1.0 / math.sqrt(2.0)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        emb: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = FusedGN(
            num_groups=self.gn_num_groups, epsilon=self.gn_eps,
            name="GroupNorm_0",
        )(x, silu=True)
        h = RingConv(self.features, ring=self.ring, name="conv1")(h)
        if emb is not None:
            h = AdaGN(
                num_groups=self.gn_num_groups, eps=self.gn_eps, name="norm2"
            )(h, emb, silu=True)
        else:
            h = FusedGN(
                num_groups=self.gn_num_groups, epsilon=self.gn_eps,
                name="norm2_gn",
            )(h, silu=True)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        h = RingConv(self.features, ring=self.ring, zero_init=True, name="conv2")(h)
        if x.shape[-1] != self.features:
            x = RingConv(self.features, kernel_size=(1, 1), padding=0, name="skip")(x)
        return (x + h) * self.scale


def softmax_f32_math(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax with f32 max/exp/sum math but logits/weights STORED in the
    compute dtype.

    ``nn.softmax(logits.astype(f32))`` makes XLA materialize the full f32
    logits array (measured: the attention fusions run at the HBM roof on it —
    1.1 GB per 2048-token block at 32×1024/ds4).  Writing the cast inside the
    elementwise chain keeps the stored tensor in bf16 while the reductions
    and exp still run in f32 inside the fusion."""
    if logits.dtype == jnp.float32:
        return jax.nn.softmax(logits, axis=axis)
    m = jax.lax.stop_gradient(jnp.max(logits, axis=axis, keepdims=True))
    p = jnp.exp((logits - m).astype(jnp.float32))
    return (p / jnp.sum(p, axis=axis, keepdims=True)).astype(logits.dtype)


def use_onepass_groupnorm(x: jnp.ndarray, group_elems: int) -> bool:
    """Single-pass GN stats on the TPU bf16 inference path?

    The direct (two-pass) variance costs XLA three reads of the activation
    slab per GN (mean pass, variance pass, normalize pass); the
    sum/sum-of-squares form fuses both stats into ONE multi-output reduction
    → 2 reads + 1 write.  GN-style reduce fusions are ~19% of the
    conditional sampler step (BASELINE.md round-3 trace), so this is a pure
    HBM-traffic win.

    Numerics: ``E[x²] − mean²`` in f32 over the image UNets' big groups
    (8k–65k elements) is accurate to ~1e-6 relative; the catastrophic
    cancellation GroupNorm32 guards against only bites tiny groups, so the
    one-pass form is refused below 512 elements.  Gated to bf16 inputs on a
    TPU backend: fp32 runs (CPU tests, parity checks) keep the direct form
    bit-for-bit.  Disable with ``LCT_ONEPASS_GN=0``.
    """
    import os

    if os.environ.get("LCT_ONEPASS_GN", "1") == "0":
        return False
    if x.dtype != jnp.bfloat16 or group_elems < 512:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


class GroupNorm32(nn.Module):
    """GroupNorm with direct (two-pass) variance.

    ``flax.linen.GroupNorm`` computes ``E[x^2] - E[x]^2``, which cancels
    catastrophically for small groups with non-zero mean (observed 2e-2
    divergence from the reference's ``torch.nn.GroupNorm`` on 2-element
    groups); the direct form matches to ~1e-5 and is also safer in bf16.
    On the TPU bf16 inference path with big groups the one-pass f32
    sum/sumsq form is used instead (see ``use_onepass_groupnorm``).
    Channel-last input; parameters named scale/bias like flax GroupNorm.
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, scale_shift=None, silu: bool = False):
        """``scale_shift=(s, t)`` fuses the ADM scale-shift conditioning
        ``GN(x)·(1+s) + t`` (s, t broadcastable (B, 1, 1, C)); ``silu`` fuses
        the trailing activation.  Both exist so the TPU fused-GN kernel can
        swallow the consumer elementwise chain; the XLA fallback applies the
        identical composition, so CPU/fp32 numerics are unchanged."""
        C = x.shape[-1]
        G = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if use_fused_groupnorm(x, G):
            B = x.shape[0]
            gamma = scale.astype(jnp.float32)
            beta = bias.astype(jnp.float32)
            if scale_shift is not None:
                s, t = scale_shift
                s1 = 1.0 + s.astype(jnp.float32).reshape(B, C)
                beta = beta * s1 + t.astype(jnp.float32).reshape(B, C)
                gamma = gamma * s1
            return fused_group_norm(
                x, gamma, beta, num_groups=G, eps=self.epsilon, silu=silu
            )
        shape = x.shape
        g = x.reshape(*shape[:-1], G, C // G)
        axes = tuple(range(1, g.ndim - 2)) + (g.ndim - 1,)
        group_elems = math.prod(g.shape[a] for a in axes)
        if use_onepass_groupnorm(x, group_elems):
            g32 = g.astype(jnp.float32)
            s1 = jnp.sum(g32, axis=axes, keepdims=True)
            s2 = jnp.sum(jnp.square(g32), axis=axes, keepdims=True)
            mean = s1 / group_elems
            var = jnp.maximum(s2 / group_elems - jnp.square(mean), 0.0)
            norm = ((g32 - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(
                x.dtype
            )
            y = norm.reshape(shape) * scale + bias
        else:
            mean = jnp.mean(g, axis=axes, keepdims=True)
            var = jnp.mean(jnp.square(g - mean), axis=axes, keepdims=True)
            g = (g - mean) * jax.lax.rsqrt(var + self.epsilon)
            y = g.reshape(shape) * scale + bias
        if scale_shift is not None:
            s, t = scale_shift
            y = y * (1 + s) + t
        if silu:
            y = nn.silu(y)
        return y
