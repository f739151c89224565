"""Fused resident GroupNorm kernel (stats + normalize + scale-shift + SiLU).

GroupNorm-style reduce fusions are ~19% of the conditional sampler step
(BASELINE.md round-3 trace).  XLA's best case for a one-pass GN is
2 reads + 1 write of the activation slab (a multi-output sum/sumsq reduction,
then a normalize pass that the consumer elementwise chain fuses into).  This
kernel keeps the whole per-image slab resident in VMEM — at the layout UNet's
shapes every level fits (32×1024×64 bf16 = 4 MB down to 4×128×512 = 0.5 MB)
— and does ONE HBM read + ONE write: stats are accumulated chunk-wise in f32
from the resident bf16 tile, per-group aggregation runs as a tiny matmul with
a group-indicator matrix (lane-friendly; no cross-lane reshapes), and the
normalize + affine + optional per-batch scale-shift conditioning + optional
SiLU all happen before the single write-back.

Numerics: f32 sum/sumsq accumulation over ≥512-element groups (the same
one-pass form as ``models.ops.use_onepass_groupnorm``; the catastrophic-
cancellation guard in ``GroupNorm32`` only matters for tiny groups, which
are refused here).  The backward pass recomputes the same math with plain
XLA ops via ``jax.vjp`` (``pallas_call`` has no transpose rule), so training
on TPU differentiates cleanly.

Not a port: the reference normalizes with ``torch.nn.GroupNorm`` /
ADM ``normalization()`` (``lidargen/models/unets/layout_unet_v1.py:40-44``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled jaxlib builds
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# VMEM gate: pallas double-buffers the in and out blocks, so a slab costs
# ~4x its bf16 bytes; 3 MB keeps the total under ~12 MB of the ~16 MB budget.
_MAX_SLAB_BYTES = 3 * 1024 * 1024
_CHUNK = 512  # rows per in-kernel stats/normalize chunk


def _gn_kernel(
    x_ref, a_ref, b_ref, m_ref, o_ref, *, n_per_group: int, chunk: int,
    silu: bool, eps: float,
):
    HW, C = x_ref.shape[1], x_ref.shape[2]
    s1 = jnp.zeros((1, C), jnp.float32)
    s2 = jnp.zeros((1, C), jnp.float32)
    for i in range(HW // chunk):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        s1 = s1 + jnp.sum(xc, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(xc * xc, axis=0, keepdims=True)
    m = m_ref[...]  # (C, G) group-indicator
    a_row = a_ref[0]  # (1, C) this batch row's effective gamma
    b_row = b_ref[0]
    g1 = jax.lax.dot(s1, m, preferred_element_type=jnp.float32)  # (1, G)
    g2 = jax.lax.dot(s2, m, preferred_element_type=jnp.float32)
    mean_g = g1 / n_per_group
    var_g = jnp.maximum(g2 / n_per_group - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back per channel: (1,G) @ (G,C) via m's transpose
    mean_c = jax.lax.dot_general(
        mean_g, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (1, C)
    rstd_c = jax.lax.dot_general(
        rstd_g, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scale = rstd_c * a_row  # a = effective gamma (B-row), (1, C)
    shift = b_row - mean_c * scale
    for i in range(HW // chunk):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xc * scale + shift
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)


def _gn_call(x, a, b, m, *, num_groups, eps, silu, chunk, interpret):
    B, HW, C = x.shape
    a = a.reshape(B, 1, C)
    b = b.reshape(B, 1, C)
    kernel = functools.partial(
        _gn_kernel,
        n_per_group=HW * (C // num_groups),
        chunk=chunk,
        silu=silu,
        eps=eps,
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0)),
            # (B, 1, C) with a (1, 1, C) block: Mosaic requires the last two
            # block dims divisible by (8, 128) OR equal to the array dims —
            # a (1, C) block of a (B, C) array violates the sublane rule
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((C, num_groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), x.dtype),
        interpret=interpret,
    )(x, a, b, m)


def _gn_ref(x, a, b, *, num_groups, eps, silu):
    """XLA mirror of the kernel math (one-pass f32 stats); used for the
    backward recompute and as the interpret-free fallback in tests."""
    B, HW, C = x.shape
    G = num_groups
    x32 = x.reshape(B, HW, G, C // G).astype(jnp.float32)
    s1 = jnp.sum(x32, axis=(1, 3), keepdims=True)
    s2 = jnp.sum(x32 * x32, axis=(1, 3), keepdims=True)
    n = HW * (C // G)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    norm = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = norm.reshape(B, HW, C) * a[:, None, :] + b[:, None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gn_ad(statics, x, a, b, m):
    num_groups, eps, silu, chunk, interpret = statics
    return _gn_call(
        x, a, b, m,
        num_groups=num_groups, eps=eps, silu=silu, chunk=chunk,
        interpret=interpret,
    )


def _gn_ad_fwd(statics, x, a, b, m):
    return _gn_ad(statics, x, a, b, m), (x, a, b)


def _gn_ad_bwd(statics, res, g):
    num_groups, eps, silu, _, _ = statics
    x, a, b = res
    _, vjp = jax.vjp(
        functools.partial(_gn_ref, num_groups=num_groups, eps=eps, silu=silu),
        x, a, b,
    )
    dx, da, db = vjp(g)
    return dx, da, db, None


_gn_ad.defvjp(_gn_ad_fwd, _gn_ad_bwd)


def fused_group_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    num_groups: int,
    eps: float,
    silu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """GroupNorm(+affine)(+SiLU) with one HBM read + one write.

    Args:
      x: (B, H, W, C) or (B, L, C) activations.
      gamma/beta: per-channel (C,) or per-batch-and-channel (B, C) effective
        affine — callers fold time-embedding scale-shift conditioning
        (``GN(x)·γ(1+s) + (β(1+s)+t)``) into these.
      silu: fuse the trailing SiLU into the write-back.

    Use :func:`use_fused_groupnorm` to decide routing; fall back to the XLA
    composition otherwise.
    """
    shape = x.shape
    B, C = shape[0], shape[-1]
    hw = int(np.prod(shape[1:-1]))
    x3 = x.reshape(B, hw, C)
    gamma = jnp.broadcast_to(
        gamma.astype(jnp.float32).reshape(-1, C), (B, C)
    )
    beta = jnp.broadcast_to(beta.astype(jnp.float32).reshape(-1, C), (B, C))
    m = _group_matrix(C, num_groups)
    chunk = _CHUNK if hw % _CHUNK == 0 else hw
    out = _gn_ad(
        (num_groups, float(eps), bool(silu), chunk, bool(interpret)),
        x3, gamma, beta, m,
    )
    return out.reshape(shape)


@functools.lru_cache(maxsize=None)
def _group_matrix_np(C: int, G: int):
    m = np.zeros((C, G), np.float32)
    m[np.arange(C), np.arange(C) // (C // G)] = 1.0
    return m


def _group_matrix(C: int, G: int) -> jnp.ndarray:
    return jnp.asarray(_group_matrix_np(C, G))


def use_fused_groupnorm(x: jnp.ndarray, num_groups: int) -> bool:
    """Route this GN through the resident Mosaic kernel?

    OPT-IN (``LCT_FUSED_GN=1``): measured on the v5e tunnel chip, the kernel
    is ~5% SLOWER end-to-end than XLA's own GN fusion chain on the layout
    sampler (5.67 vs 5.98 f/s at B=8; 17.48 vs 17.71 GB/step — it does save
    a little HBM traffic, but the in-kernel serial chunk loop overlaps worse
    than XLA's fused reduce+normalize).  Kept as a correct, on-chip-verified
    Mosaic reference and for backends/shapes where the tradeoff may flip.

    When enabled: requires a TPU backend, bf16 slabs that fit the VMEM
    budget, lane-friendly channel counts and big groups (the f32 one-pass
    stats guard, cf. ``use_onepass_groupnorm``).
    """
    import os

    if os.environ.get("LCT_FUSED_GN", "0") != "1":
        return False
    if not _HAS_PLTPU or x.dtype != jnp.bfloat16 or x.ndim < 3:
        return False
    C = x.shape[-1]
    hw = int(np.prod(x.shape[1:-1]))
    if C % num_groups or C % 128 or (hw % _CHUNK and hw > _CHUNK):
        return False
    if hw * (C // num_groups) < 512:  # tiny groups: keep direct variance
        return False
    if hw * C * x.dtype.itemsize > _MAX_SLAB_BYTES:
        return False
    try:
        # single-device only: pallas_call is an opaque custom call GSPMD
        # cannot partition, so sharded multi-chip graphs keep the XLA path
        if jax.default_backend() not in ("tpu", "axon") or jax.device_count() != 1:
            return False
    except Exception:  # pragma: no cover
        return False
    from .mosaic import mosaic_available

    return mosaic_available()
