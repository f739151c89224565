"""Fused resident GroupNorm kernel — interpret-mode semantics.

Like the attention kernel, the Mosaic program only compiles on a TPU
backend; CI pins the kernel body's semantics (chunked f32 stats, group
matmul aggregation, scale-shift fold, fused SiLU, custom VJP) in pallas
interpret mode against the module composition it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidarcrafter_tpu.ops.pallas_groupnorm import (
    _gn_ref,
    fused_group_norm,
    use_fused_groupnorm,
)


def _direct_gn(x, gamma, beta, G, eps):
    B, H, W, C = x.shape
    g = x.reshape(B, H, W, G, C // G)
    mean = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(g - mean), axis=(1, 2, 4), keepdims=True)
    y = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(B, H, W, C)
    return y * gamma + beta


@pytest.mark.parametrize("silu", [False, True])
@pytest.mark.parametrize("shape,G", [((2, 8, 64, 128), 32), ((2, 4, 128, 256), 32)])
def test_fused_gn_matches_direct(shape, G, silu):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], shape, jnp.float32) * 2.0 + 0.7
    C = shape[-1]
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (C,))
    beta = 0.1 * jax.random.normal(ks[2], (C,))
    got = fused_group_norm(
        x, gamma, beta, num_groups=G, eps=1e-5, silu=silu, interpret=True
    )
    ref = _direct_gn(x, gamma, beta, G, 1e-5)
    if silu:
        ref = ref * jax.nn.sigmoid(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_gn_scale_shift_fold_matches_module_composition():
    """gamma_eff/beta_eff folding must equal GN → ·(1+s)+t → SiLU."""
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    B, H, W, C, G = 2, 8, 64, 128, 32
    x = jax.random.normal(ks[0], (B, H, W, C)) * 1.5
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (C,))
    beta = 0.1 * jax.random.normal(ks[2], (C,))
    s = 0.3 * jax.random.normal(ks[3], (B, 1, 1, C))
    t = 0.3 * jax.random.normal(ks[4], (B, 1, 1, C))

    s1 = 1.0 + s.reshape(B, C)
    gamma_eff = gamma[None, :] * s1
    beta_eff = beta[None, :] * s1 + t.reshape(B, C)
    got = fused_group_norm(
        x, gamma_eff, beta_eff, num_groups=G, eps=1e-5, silu=True,
        interpret=True,
    )
    ref = _direct_gn(x, gamma, beta, G, 1e-5) * (1 + s) + t
    ref = ref * jax.nn.sigmoid(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_gn_grad_matches_xla():
    """The custom VJP (XLA one-pass recompute) must match grads of the
    reference math for x, gamma and beta."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    B, H, W, C, G = 2, 4, 128, 128, 32
    x = jax.random.normal(ks[0], (B, H, W, C))
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (B, C))
    beta = 0.1 * jax.random.normal(ks[2], (B, C))
    cot = jax.random.normal(jax.random.PRNGKey(3), (B, H, W, C))

    def loss_kernel(x, gamma, beta):
        y = fused_group_norm(x, gamma, beta, num_groups=G, eps=1e-5,
                             silu=True, interpret=True)
        return jnp.sum(y * cot)

    def loss_ref(x, gamma, beta):
        y = _gn_ref(x.reshape(B, H * W, C), gamma, beta, num_groups=G,
                    eps=1e-5, silu=True).reshape(B, H, W, C)
        return jnp.sum(y * cot)

    g_got = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, gamma, beta)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_fused_gn_gating():
    assert jax.default_backend() == "cpu"
    x = jnp.zeros((2, 8, 64, 128), jnp.bfloat16)
    assert not use_fused_groupnorm(x, 32)  # CPU: off


def test_groupnorm32_kwargs_match_inline_composition():
    """The new scale_shift/silu kwargs on GroupNorm32 (XLA fallback path)
    must reproduce the previous inline composition bit-for-bit on CPU."""
    from lidarcrafter_tpu.models.ops import GroupNorm32

    gn = GroupNorm32(num_groups=32, epsilon=1e-5)
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    B, H, W, C = 2, 8, 64, 128
    x = jax.random.normal(ks[0], (B, H, W, C))
    s = 0.3 * jax.random.normal(ks[1], (B, 1, 1, C))
    t = 0.3 * jax.random.normal(ks[2], (B, 1, 1, C))
    params = gn.init(ks[3], x)

    got = gn.apply(params, x, scale_shift=(s, t), silu=True)
    base = gn.apply(params, x)
    ref = base * (1 + s) + t
    ref = jax.nn.silu(ref)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
