"""OpenAI/LDM UNet (legacy alternative backbone): shape + conditioning."""

import numpy as np

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.models import build_model
from lidarcrafter_tpu.models.openai_unet import OpenAIUNet, ldm_timestep_embedding


def test_ldm_timestep_embedding_formula():
    """cos-first, freqs /half (LDM convention, not ADM's /(half-1))."""
    t = jnp.array([0.0, 7.0])
    got = np.asarray(ldm_timestep_embedding(t, 8))
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    want = np.concatenate([np.cos(args), np.sin(args)], -1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _run(model, y=None, ctx=None, H=16, W=32, Cin=2):
    x = jnp.asarray(np.random.RandomState(0).randn(2, H, W, Cin), jnp.float32)
    cond = {"time_condition": jnp.array([3.0, 11.0])}
    if ctx is not None:
        cond["other_condition"] = ctx
    args = (x, cond) if y is None else (x, cond, y)
    params = model.init(jax.random.PRNGKey(0), *args)
    return np.asarray(model.apply(params, *args))


def test_openai_unet_forward_shape():
    model = build_model(
        "openai_unet",
        resolution=(16, 32), in_channels=2, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2, 4),
        num_head_channels=8,
    )
    out = _run(model)
    assert out.shape == (2, 16, 32, 2)
    assert np.isfinite(out).all()
    # zero-init output conv → exactly zero at init
    np.testing.assert_allclose(out, 0.0)


def test_openai_unet_class_conditional():
    model = OpenAIUNet(
        resolution=(16, 32), in_channels=2, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=4, num_classes=10, use_scale_shift_norm=True,
        resblock_updown=True,
    )
    out = _run(model, y=jnp.array([1, 7]))
    assert out.shape == (2, 16, 32, 2)


def test_openai_unet_spatial_transformer_context():
    """Cross-attention context changes the output (post-init params)."""
    model = OpenAIUNet(
        resolution=(16, 32), in_channels=2, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, context_dim=12,
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 32, 2), jnp.float32)
    ctx1 = jnp.asarray(rng.randn(2, 5, 12), jnp.float32)
    ctx2 = jnp.asarray(rng.randn(2, 5, 12), jnp.float32)
    cond1 = {"time_condition": jnp.array([3.0, 11.0]), "other_condition": ctx1}
    params = model.init(jax.random.PRNGKey(0), x, cond1)
    # perturb params away from zero-init so context reaches the output
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * np.random.RandomState(2).randn(*a.shape).astype(a.dtype),
        params,
    )
    o1 = model.apply(params, x, cond1)
    o2 = model.apply(params, x, dict(cond1, other_condition=ctx2))
    assert float(jnp.abs(o1 - o2).max()) > 1e-6


def test_openai_unet_coords_encoding():
    model = OpenAIUNet(
        resolution=(16, 32), in_channels=2, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        num_heads=4, coords_encoding="fourier_features",
    )
    out = _run(model)
    assert out.shape == (2, 16, 32, 2)
