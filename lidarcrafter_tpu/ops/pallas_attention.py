"""Fused (flash-style) attention kernel for the layout denoiser's hot blocks.

The conditional sampler's dominant non-conv cost is the ds=4
``ObjectAwareCrossAttention``: 5 blocks × 50 steps materialize a
(B·h, 2048, 2048+L2) logits tensor in HBM three times over (QK write,
softmax read/write, AV read) — ~1.3 GB of traffic per block-step at B=8
(measured round 3, BASELINE.md).  This kernel keeps the logits tile in VMEM:
each grid program loads one query tile plus the FULL key/value strip
(2048+pad keys × 64ch bf16 ≈ 0.3 MB — far under the ~16 MB VMEM budget),
computes logits on the MXU with f32 accumulation, softmaxes in-register and
writes only the (block_q, dv) output.  No online-softmax pass structure is
needed because the whole KV strip fits in VMEM at these shapes.

Numerics: logits accumulate in f32 on the MXU (the XLA path rounds them to
bf16 storage first), softmax is f32, and the probability matrix is cast to
the value dtype for the AV matmul — i.e. at least as accurate as the
unfused ``softmax_f32_math`` path it replaces.

Not a port: the reference's attention is cuDNN-backed torch SDPA
(``lidargen/models/unets/layout_unet_v1.py:555-592``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled jaxlib builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int):
    q = q_ref[0]  # (block_q, dqk)  — pre-scaled by the caller
    k = k_ref[0]  # (Lkv_pad, dqk)
    v = v_ref[0]  # (Lkv_pad, dv)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, Lkv_pad)
    if kv_len < k.shape[0]:
        idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(idx < kv_len, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    w = jnp.exp(logits - m)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        w.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_attention_call(q, k, v, *, kv_len: int, block_q: int, interpret: bool):
    BH, Lq, dqk = q.shape
    Lkv = k.shape[1]
    dv = v.shape[2]
    kernel = functools.partial(_attn_kernel, kv_len=kv_len)
    return pl.pallas_call(
        kernel,
        grid=(BH, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dqk), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Lkv, dqk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Lkv, dv), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dv), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lq, dv), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_attention_ad(statics, q, k, v):
    kv_len, block_q, interpret = statics
    return _flash_attention_call(
        q, k, v, kv_len=kv_len, block_q=block_q, interpret=interpret
    )


def _flash_attention_fwd(statics, q, k, v):
    return _flash_attention_ad(statics, q, k, v), (q, k, v)


def _flash_attention_bwd(statics, res, g):
    """Reverse mode recomputes the attention weights with plain XLA f32 math
    (``pallas_call`` has no transpose rule, so training on a TPU backend —
    where ``use_fused_attention`` routes forward through the kernel — would
    otherwise fail to differentiate).  Standard flash-attention recompute:
    no residual softmax is stored, the backward re-derives it from (q, k)."""
    kv_len, _, _ = statics
    q, k, v = res
    q32, k32, v32 = (a.astype(jnp.float32) for a in (q, k, v))
    logits = jnp.einsum("bld,bmd->blm", q32, k32)
    Lkv = k.shape[1]
    if kv_len < Lkv:
        mask = jnp.arange(Lkv) < kv_len
        logits = jnp.where(mask[None, None, :], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("blm,bld->bmd", w, g32)
    dw = jnp.einsum("bld,bmd->blm", g32, v32)
    dlogits = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq = jnp.einsum("blm,bmd->bld", dlogits, k32)
    dk = jnp.einsum("blm,bld->bmd", dlogits, q32)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention_ad.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_len: int | None = None,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax(q kᵀ) v with the logits kept in VMEM.

    Args:
      q: (BH, Lq, dqk) queries, already scaled (the caller applies the
         1/sqrt(sqrt(d)) convention to q AND k, matching the XLA path).
      k: (BH, Lkv, dqk) keys; ``kv_len`` < Lkv masks the padded tail.
      v: (BH, Lkv, dv) values.
      kv_len: number of real keys (default: all of Lkv).
      block_q: query rows per grid program (logits tile = block_q × Lkv f32);
         512 measured best on-chip at the production 2048×2176 shapes
         (1.668 ms vs 1.742 @ 256, 1.981 @ 128; 1024 is 2% faster still
         but doubles the ~4.5 MB VMEM logits tile).

    Differentiable: the forward runs the Mosaic kernel; the backward
    recomputes attention with XLA f32 math (see ``_flash_attention_bwd``).

    Returns (BH, Lq, dv) in q's dtype.
    """
    Lq = q.shape[1]
    Lkv = k.shape[1]
    kv_len = Lkv if kv_len is None else int(kv_len)
    block_q = min(block_q, Lq)
    assert Lq % block_q == 0, (Lq, block_q)
    return _flash_attention_ad((kv_len, block_q, bool(interpret)), q, k, v)


def attention_bhld(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, heads, L, d) convenience wrapper: flattens batch·heads, zero-pads
    the KV strip to a lane multiple (masked via ``kv_len``) and restores the
    head axis.  The caller pre-scales q and k (the blocks' 1/sqrt(sqrt(d))
    convention applied to both operands)."""
    B, h, Lq, dqk = q.shape
    Lkv = k.shape[2]
    dv = v.shape[3]
    pad = (-Lkv) % 128
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    out = flash_attention(
        q.reshape(B * h, Lq, dqk),
        k.reshape(B * h, Lkv + pad, dqk),
        v.reshape(B * h, Lkv + pad, dv),
        kv_len=Lkv,
        block_q=block_q,
        interpret=interpret,
    )
    return out.reshape(B, h, Lq, dv)


def _oaca_kernel(
    qc_ref, ipeq_ref, kimg_ref, kl_ref, vc_ref, vl_ref, o_ref,
    *, scale2: float, l2_len: int,
):
    """ObjectAwareCrossAttention forward for one (batch·head, q-tile) program.

    The query concat [q_c | ipe] happens in VMEM (each program owns its q
    tile — no rebuild waste); the image K strip arrives pre-concatenated
    (XLA fuses that concat; rebuilding it per program measured +30 ms/call).
    The layout strip stays SPLIT from the image strip, so the XLA-side
    ``k_mix``/``v_mix`` concat + pad-to-lane-multiple materializations
    (measured 27 + 23 ms per 50-step call, round-4 trace) never exist.  The
    softmax runs jointly over both strips; ``scale2`` folds the reference's
    q·scale, k·scale pre-multiplies into the f32 logits.
    """
    q = jnp.concatenate([qc_ref[0], ipeq_ref[0]], axis=-1)  # (bq, dc+dp)
    l1 = jax.lax.dot_general(
        q, kimg_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale2
    l2 = jax.lax.dot_general(
        q, kl_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale2
    if l2_len < l2.shape[-1]:
        idx = jax.lax.broadcasted_iota(jnp.int32, l2.shape, 1)
        l2 = jnp.where(idx < l2_len, l2, -jnp.inf)
    m = jnp.maximum(
        jnp.max(l1, axis=-1, keepdims=True), jnp.max(l2, axis=-1, keepdims=True)
    )
    e1 = jnp.exp(l1 - m)
    e2 = jnp.exp(l2 - m)
    den = jnp.sum(e1, axis=-1, keepdims=True) + jnp.sum(e2, axis=-1, keepdims=True)
    vc = vc_ref[0]
    out = jax.lax.dot_general(
        (e1 / den).astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        (e2 / den).astype(vc.dtype), vl_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _oaca_unfused(q_c, ipe, k_c, k_l, v_c, v_l, scale):
    """XLA reference formulation (the blocks' einsum math); used as the
    backward-pass recompute — ``pallas_call`` has no transpose rule, so the
    fused forward pairs with a plain-XLA reverse (standard flash-attention
    recompute, same policy as ``_flash_attention_bwd``)."""
    q_img = jnp.concatenate([q_c, ipe], axis=-1)
    k_img = jnp.concatenate([k_c, ipe], axis=-1)
    k_mix = jnp.concatenate([k_img, k_l], axis=2)
    v_mix = jnp.concatenate([v_c, v_l], axis=2)
    logits = jnp.einsum(
        "bhtc,bhsc->bhts",
        (q_img * scale).astype(jnp.float32),
        (k_mix * scale).astype(jnp.float32),
    )
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bhsc->bhtc", w, v_mix.astype(jnp.float32)).astype(
        q_c.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _oaca_ad(statics, q_c, ipe, k_c, k_l, v_c, v_l):
    scale, block_q, interpret = statics
    return _oaca_call(
        q_c, ipe, k_c, k_l, v_c, v_l,
        scale=scale, block_q=block_q, interpret=interpret,
    )


def _oaca_fwd(statics, q_c, ipe, k_c, k_l, v_c, v_l):
    return _oaca_ad(statics, q_c, ipe, k_c, k_l, v_c, v_l), (
        q_c, ipe, k_c, k_l, v_c, v_l,
    )


def _oaca_bwd(statics, res, g):
    scale = statics[0]
    _, vjp = jax.vjp(lambda *a: _oaca_unfused(*a, scale), *res)
    return vjp(g)


_oaca_ad.defvjp(_oaca_fwd, _oaca_bwd)


def oaca_attention(
    q_c: jnp.ndarray,
    ipe: jnp.ndarray,
    k_c: jnp.ndarray,
    k_l: jnp.ndarray,
    v_c: jnp.ndarray,
    v_l: jnp.ndarray,
    *,
    scale: float,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable wrapper: Mosaic forward, XLA-recompute backward."""
    return _oaca_ad(
        (float(scale), int(block_q), bool(interpret)),
        q_c, ipe, k_c, k_l, v_c, v_l,
    )


def _oaca_call(
    q_c: jnp.ndarray,
    ipe: jnp.ndarray,
    k_c: jnp.ndarray,
    k_l: jnp.ndarray,
    v_c: jnp.ndarray,
    v_l: jnp.ndarray,
    *,
    scale: float,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ObjectAwareCrossAttention over split image/layout strips.

    Args (all (B, h, L, d), bf16 or f32):
      q_c / k_c / v_c: per-head image content projections, L = H·W tokens.
      ipe: per-head image-patch positional embedding — used on BOTH the
        query and key side (the block concatenates the same ipe onto q_c and
        k_c, ``models/layout_unet.py:207-208``), so it is passed once and
        mapped into the kernel twice.
      k_l / v_l: layout-token strips; k_l is the (small) pre-concatenated
        [k_content | layout-pe] strip, L2 real tokens (any length — the
        kernel masks past it after internal padding).
      scale: the per-operand 1/sqrt(sqrt(d)) factor; applied as scale² on
        the f32 logits (exactly (q·s)·(k·s) up to one bf16 rounding, which
        the f32 route avoids).

    Returns (B, h, Lq, dv).
    """
    B, h, Lq, dc = q_c.shape
    dp = ipe.shape[-1]
    L2 = k_l.shape[2]
    dv = v_c.shape[-1]
    # image K strip pre-concatenated (one fused XLA concat, reused by every
    # q-tile program); layout strip stays split and sublane-padded
    k_img = jnp.concatenate([k_c, ipe], axis=-1)
    L2p = max(((L2 + 7) // 8) * 8, 8)
    if L2p != L2:
        k_l = jnp.pad(k_l, ((0, 0), (0, 0), (0, L2p - L2), (0, 0)))
        v_l = jnp.pad(v_l, ((0, 0), (0, 0), (0, L2p - L2), (0, 0)))
    BH = B * h
    block_q = min(block_q, Lq)
    assert Lq % block_q == 0, (Lq, block_q)
    flat = lambda t: t.reshape(BH, *t.shape[2:])
    kernel = functools.partial(
        _oaca_kernel, scale2=float(scale) ** 2, l2_len=L2
    )
    out = pl.pallas_call(
        kernel,
        grid=(BH, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dc), lambda b, i: (b, i, 0)),   # q_c
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0)),   # ipe (q side)
            pl.BlockSpec((1, Lq, dc + dp), lambda b, i: (b, 0, 0)),   # k_img
            pl.BlockSpec((1, L2p, dc + dp), lambda b, i: (b, 0, 0)),  # k_l
            pl.BlockSpec((1, Lq, dv), lambda b, i: (b, 0, 0)),        # v_c
            pl.BlockSpec((1, L2p, dv), lambda b, i: (b, 0, 0)),       # v_l
        ],
        out_specs=pl.BlockSpec((1, block_q, dv), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lq, dv), q_c.dtype),
        interpret=interpret,
    )(flat(q_c), flat(ipe), flat(k_img), flat(k_l), flat(v_c), flat(v_l))
    return out.reshape(B, h, Lq, dv)


def use_fused_attention(Lq: int, block_q: int = 512) -> bool:
    """Route the layout attention blocks through the Mosaic kernel?

    True on a TPU backend (incl. the ``axon`` tunnel) for tile-divisible
    query lengths, unless disabled via ``LCT_FUSED_ATTN=0``.  CPU (the test
    suite / virtual multichip dryrun) keeps the plain-XLA path.
    """
    import os

    if os.environ.get("LCT_FUSED_ATTN", "1") == "0":
        return False
    if not _HAS_PLTPU or Lq % min(block_q, Lq) != 0:
        return False
    try:
        # single-device only: pallas_call is an opaque custom call GSPMD
        # cannot partition, so sharded multi-chip graphs keep the XLA path
        # (which partitions natively over the mesh)
        if jax.default_backend() not in ("tpu", "axon") or jax.device_count() != 1:
            return False
    except Exception:  # pragma: no cover
        return False
    from .mosaic import mosaic_available

    return mosaic_available()
