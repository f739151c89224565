"""Fused (flash-style) layout attention kernel — interpret-mode semantics.

The Mosaic kernel itself only compiles on a TPU backend (validated on-chip
round 3: forward identical to the XLA path at bf16, +40% conditional-sampler
throughput).  CI runs on CPU, so here the kernel body executes in pallas
interpret mode, which pins its *semantics* (tiling, kv masking, f32 softmax)
exactly against the blocks' einsum formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidarcrafter_tpu.ops.pallas_attention import (
    attention_bhld,
    flash_attention,
    oaca_attention,
    use_fused_attention,
)


def _ref(q, k, v):
    logits = jnp.einsum("bhtc,bhsc->bhts", q, k)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsc->bhtc", w, v)


@pytest.mark.parametrize(
    "B,h,Lq,Lkv,dqk,dv",
    [
        (2, 2, 256, 269, 64, 32),   # OACA shape class: kv = Lq + 13 layout tokens
        (1, 4, 256, 141, 32, 32),   # GLIDE shape class: kv = Lq/2 + 13
        (2, 1, 512, 512, 64, 64),   # no padding needed
    ],
)
def test_attention_bhld_matches_einsum(B, h, Lq, Lkv, dqk, dv):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, h, Lq, dqk), jnp.float32)
    k = jax.random.normal(ks[1], (B, h, Lkv, dqk), jnp.float32)
    v = jax.random.normal(ks[2], (B, h, Lkv, dv), jnp.float32)
    got = attention_bhld(q, k, v, interpret=True)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "B,h,L1,L2,dc,dp,dv",
    [
        (2, 2, 256, 13, 32, 32, 32),   # production OACA class (scale=1.0 pe)
        (1, 3, 128, 5, 32, 16, 32),    # half-scale pe, odd layout count
        (2, 1, 512, 8, 64, 64, 64),    # L2 already a sublane multiple
    ],
)
def test_oaca_attention_matches_block_einsum(B, h, L1, L2, dc, dp, dv):
    """The split-strip OACA kernel must equal the block's unfused math:
    q=[q_c|ipe], k_img=[k_c|ipe], k_mix=[k_img;k_l], joint f32 softmax —
    with the scale folded as scale^2 on the logits."""
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    q_c = jax.random.normal(ks[0], (B, h, L1, dc), jnp.float32)
    ipe = jax.random.normal(ks[1], (B, h, L1, dp), jnp.float32)
    k_c = jax.random.normal(ks[2], (B, h, L1, dc), jnp.float32)
    k_l = jax.random.normal(ks[3], (B, h, L2, dc + dp), jnp.float32)
    v_c = jax.random.normal(ks[4], (B, h, L1, dv), jnp.float32)
    v_l = jax.random.normal(ks[5], (B, h, L2, dv), jnp.float32)
    scale = float(1.0 / np.sqrt(np.sqrt(dc + dp)))

    got = oaca_attention(q_c, ipe, k_c, k_l, v_c, v_l, scale=scale,
                         block_q=128, interpret=True)

    q_img = jnp.concatenate([q_c, ipe], axis=-1)
    k_img = jnp.concatenate([k_c, ipe], axis=-1)
    k_mix = jnp.concatenate([k_img, k_l], axis=2)
    v_mix = jnp.concatenate([v_c, v_l], axis=2)
    ref = _ref(q_img * scale, k_mix * scale, v_mix)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_oaca_attention_bf16_close_to_f32():
    """bf16 strips through the kernel stay within bf16 tolerance of the f32
    unfused math (the production dtype)."""
    B, h, L1, L2, dc, dp, dv = 1, 2, 128, 13, 32, 32, 32
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    args32 = [
        jax.random.normal(k, s, jnp.float32)
        for k, s in zip(ks, [
            (B, h, L1, dc), (B, h, L1, dp), (B, h, L1, dc),
            (B, h, L2, dc + dp), (B, h, L1, dv), (B, h, L2, dv),
        ])
    ]
    scale = float(1.0 / np.sqrt(np.sqrt(dc + dp)))
    got = oaca_attention(*[a.astype(jnp.bfloat16) for a in args32],
                         scale=scale, block_q=128, interpret=True)
    q_c, ipe, k_c, k_l, v_c, v_l = args32
    q_img = jnp.concatenate([q_c, ipe], axis=-1)
    k_mix = jnp.concatenate(
        [jnp.concatenate([k_c, ipe], axis=-1), k_l], axis=2
    )
    v_mix = jnp.concatenate([v_c, v_l], axis=2)
    ref = _ref(q_img * scale, k_mix * scale, v_mix)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=2e-2, rtol=2e-2
    )


def test_oaca_attention_grad_matches_unfused():
    """The custom VJP (XLA-recompute backward) must match differentiating
    the unfused block math directly."""
    B, h, L1, L2, dc, dp, dv = 1, 2, 128, 5, 32, 16, 32
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    args = [
        jax.random.normal(k, s, jnp.float32)
        for k, s in zip(ks, [
            (B, h, L1, dc), (B, h, L1, dp), (B, h, L1, dc),
            (B, h, L2, dc + dp), (B, h, L1, dv), (B, h, L2, dv),
        ])
    ]
    scale = 0.41

    def fused_loss(*a):
        return jnp.sum(
            oaca_attention(*a, scale=scale, block_q=128, interpret=True) ** 2
        )

    def ref_loss(*a):
        q_c, ipe, k_c, k_l, v_c, v_l = a
        q_img = jnp.concatenate([q_c, ipe], axis=-1)
        k_mix = jnp.concatenate(
            [jnp.concatenate([k_c, ipe], axis=-1), k_l], axis=2
        )
        v_mix = jnp.concatenate([v_c, v_l], axis=2)
        return jnp.sum(_ref(q_img * scale, k_mix * scale, v_mix) ** 2)

    g_fused = jax.grad(fused_loss, argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(ref_loss, argnums=tuple(range(6)))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_flash_attention_masks_padded_tail():
    """Zero-padded keys must not leak probability mass."""
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    BH, Lq, Lkv, d = 2, 256, 200, 32
    pad = 56
    q = jax.random.normal(ks[0], (BH, Lq, d), jnp.float32)
    k = jax.random.normal(ks[1], (BH, Lkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (BH, Lkv, d), jnp.float32)
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    # poison the padded value rows: they must be ignored entirely
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)), constant_values=1e6)
    got = flash_attention(q, kp, vp, kv_len=Lkv, interpret=True)
    w = jax.nn.softmax(jnp.einsum("btc,bsc->bts", q, k).astype(jnp.float32), -1)
    ref = jnp.einsum("bts,bsc->btc", w, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_attention_disabled_on_cpu():
    # CI pins jax to CPU (conftest): the model blocks must keep the XLA path
    assert jax.default_backend() == "cpu"
    assert not use_fused_attention(2048)


def test_block_q_clamps_to_short_query():
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (1, 2, 128, 32), jnp.float32)
    k = jax.random.normal(ks[1], (1, 2, 141, 32), jnp.float32)
    v = jax.random.normal(ks[2], (1, 2, 141, 32), jnp.float32)
    got = attention_bhld(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(q, k, v)), atol=2e-5, rtol=2e-5
    )


def test_flash_attention_grad_matches_einsum():
    """Training on a TPU backend differentiates through the kernel: the
    custom VJP (XLA f32 recompute) must match grads of the einsum form,
    including with a masked padded KV tail."""
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    BH, Lq, Lkv, d = 2, 256, 200, 32
    pad = 56
    q = jax.random.normal(ks[0], (BH, Lq, d), jnp.float32)
    k = jax.random.normal(ks[1], (BH, Lkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (BH, Lkv, d), jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(5), (BH, Lq, d), jnp.float32)

    def loss_kernel(q, k, v):
        kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        out = flash_attention(q, kp, vp, kv_len=Lkv, interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(q, k, v):
        w = jax.nn.softmax(jnp.einsum("btc,bsc->bts", q, k), -1)
        return jnp.sum(jnp.einsum("bts,bsc->btc", w, v) * cot)

    g_got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


def test_fused_attention_fn_matches_flax_mha():
    """`fused_attention_fn` (flax MHA attention_fn hook, used by
    SelfAttention2d on TPU) must equal nn.dot_product_attention."""
    from flax import linen as nn

    from lidarcrafter_tpu.models.ops import fused_attention_fn

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    B, L, h, d = 2, 512, 8, 64
    q = jax.random.normal(ks[0], (B, L, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (B, L, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, L, h, d), jnp.float32)
    got = fused_attention_fn(q, k, v, interpret=True)
    ref = nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
