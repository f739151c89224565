"""Config registry completeness + factory construction smoke tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.configs import __all__ as registry, get_config

REFERENCE_KEYS = {
    "kitti-360",
    "nuscenes-unet-uncond",
    "nuscenes-hdit-uncond",
    "nuscenes-auto-reg",
    "nuscenes-auto-reg-v2",
    "nuscenes-box-layout",
    "nuscenes-box-layout-v1",
    "nuscenes-box-layout-v2",
    "nuscenes-box-layout-v3",
    "nuscenes-box-layout-v4",
    "nuscenes-box-layout-v5",
    "nuscenes-box-layout-v6",
    "meanflow-nusc",
    "nuscenes-layout",
    "nuscenes-object",
}


def test_registry_matches_reference_keys():
    """cf. lidargen/utils/configs/__init__.py:17-33 — same names."""
    assert set(registry.keys()) == REFERENCE_KEYS


@pytest.mark.parametrize("name", sorted(REFERENCE_KEYS))
def test_all_configs_instantiate(name):
    cfg = get_config(name)
    assert cfg.model.architecture
    assert cfg.data.resolution


def test_config_key_fields():
    cfg = get_config("nuscenes-auto-reg-v2")
    assert cfg.condition_model.params["out_channels"] == 11
    assert cfg.diffusion.cond_mode == "concat"
    assert cfg.training.num_steps == 500_000
    cfg = get_config("nuscenes-box-layout-v6")
    assert cfg.data.delete_ground
    assert cfg.condition_model.params["out_channels"] == 10
    cfg = get_config("nuscenes-layout")
    assert cfg.model.params["model_channels"] == 512
    assert not cfg.diffusion.clip_sample
    cfg = get_config("kitti-360")
    assert cfg.data.resolution == (64, 1024)


def test_factory_uncond():
    from lidarcrafter_tpu.training import build_diffusion_training

    cfg = get_config("nuscenes-unet-uncond")
    cfg.data.resolution = (32, 64)  # shrink for test speed
    model, engine, utils = build_diffusion_training(cfg)
    x = jnp.zeros((1, 32, 64, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    loss = engine.loss(params, jax.random.PRNGKey(1), x)
    assert np.isfinite(float(loss))


def test_factory_object_branch():
    from lidarcrafter_tpu.training.factory import build_object_training

    cfg = get_config("nuscenes-object")
    cfg.data.num_samples = 64
    models, engine, _ = build_object_training(cfg)
    r = np.random.RandomState(0)
    input_dict = {
        "x_0": jnp.asarray(r.randn(2, 64, 4).astype(np.float32)),
        "fg_encoding_box": jnp.asarray(r.randn(2, 6).astype(np.float32)),
        "fg_class": jnp.asarray([0, 3]),
        "fg_text_features": jnp.asarray(r.randn(8, 512).astype(np.float32)),
    }
    params = {
        "cond": models["cond"].init(jax.random.PRNGKey(0), input_dict),
    }
    cond_feat = models["cond"].apply(params["cond"], input_dict)
    cd = {"time_condition": jnp.zeros((2,)), "other_condition": cond_feat}
    params["model"] = models["model"].init(jax.random.PRNGKey(1), input_dict["x_0"], cd)
    loss = engine.loss(params, jax.random.PRNGKey(2), input_dict)
    assert np.isfinite(float(loss))
    out = engine.sample(
        params, jax.random.PRNGKey(3), input_dict, batch_size=2, num_steps=2, mode="ddim"
    )
    assert out.shape == (2, 64, 4)


def test_factory_flow_branch():
    from lidarcrafter_tpu.training.factory import build_flow_training

    cfg = get_config("meanflow-nusc")
    cfg.data.resolution = (16, 32)
    model, engine, _ = build_flow_training(cfg)
    x = jnp.zeros((1, 16, 32, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), jnp.zeros((1,)))
    loss, mse = engine.loss(params, jax.random.PRNGKey(1), x)
    assert np.isfinite(float(loss))


def test_config_box_layout_v0_faithful():
    """v0 (``option_nusc_box_layout.py``): layout_unet arch, channel_mult
    (1,1,2), attention at ds=4 only, wide encoder, NO concat cond."""
    from lidarcrafter_tpu.models.layout_unet import LayoutUnet
    from lidarcrafter_tpu.training.factory import build_diffusion_training

    cfg = get_config("nuscenes-box-layout")
    assert cfg.model.architecture == "layout_unet"
    assert tuple(cfg.model.params["channel_mult"]) == (1, 1, 2)
    assert tuple(cfg.model.params["attention_ds"]) == (4,)
    assert cfg.condition_model.params["hidden_dim"] == 256
    assert cfg.condition_model.params["output_dim"] == 1024
    assert cfg.diffusion.cond_mode is None
    assert "out_channels" not in cfg.condition_model.params

    model, engine, _ = build_diffusion_training(cfg)
    assert isinstance(model["model"] if isinstance(model, dict) else model,
                      LayoutUnet)
    m = model["model"] if isinstance(model, dict) else model
    # no concat add: in = depth + reflectance only, v0 traits
    assert m.in_channels == 2
    assert not m.ring and not m.fir_updown and m.adm_time_embed
    assert m.coords_encoding is None
