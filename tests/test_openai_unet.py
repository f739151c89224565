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


# ------------------------------------------------- executed-reference parity


def _load_ref_openai_unet():
    """Execute the vendored reference openai_unet.py (never copied) as a
    package so its relative imports (.basic/.attention/.encoding/.ops)
    resolve."""
    import sys
    import types

    from tests.reference_loader import REF, _load

    pkg = types.ModuleType("refou")
    pkg.__path__ = [str(REF / "lidargen/models/unets")]
    sys.modules["refou"] = pkg
    for name in ("misc_utils", "ldm_diffusion_util", "basic", "encoding",
                 "ops", "attention"):
        mod = _load(REF / f"lidargen/models/unets/{name}.py", f"refou.{name}")
        setattr(pkg, name, mod)
    return _load(REF / "lidargen/models/unets/openai_unet.py", "refou.openai_unet")


def test_openai_unet_converter_reference_parity():
    """Executed-reference numerical parity of convert_openai_unet on a narrow
    GLIDE-attention config (class-conditional, resblock_updown=False)."""
    import torch

    from lidarcrafter_tpu.utils.torch_ckpt import convert_openai_unet

    ref_mod = _load_ref_openai_unet()
    torch.manual_seed(0)
    ref = ref_mod.OpenAIUNetModel(
        resolution=(16, 32), in_channels=2, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16, num_classes=3, dims=2, lib_name='lidm',
    ).eval()
    with torch.no_grad():
        for p in ref.parameters():
            if p.abs().max() == 0:
                p.normal_(0, 0.05)

    B = 2
    x = torch.randn(B, 2, 16, 32)
    t = torch.tensor([3.0, 11.0])
    y = torch.tensor([0, 2])
    with torch.no_grad():
        ref_out = ref(
            x, {"time_condition": t}, y=y
        ).permute(0, 2, 3, 1).numpy()

    model = OpenAIUNet(
        resolution=(16, 32), in_channels=2, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16, num_classes=3, ring=True,
    )
    variables = convert_openai_unet(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(2,),
    )
    out = model.apply(
        variables,
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        {"time_condition": jnp.asarray(t.numpy())},
        jnp.asarray(y.numpy()),
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-5)
