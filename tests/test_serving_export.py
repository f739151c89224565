"""AOT serving export (serving/export.py): serialize → reload → call must
reproduce the in-process sampler exactly, for unconditional and conditional
(per-request condition) configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidarcrafter_tpu.configs import get_config
from lidarcrafter_tpu.serving import (
    build_sampler_fn,
    export_sampler,
    load_artifact,
    save_artifact,
)
from lidarcrafter_tpu.training.factory import build_diffusion_training


def _tiny_uncond_cfg():
    cfg = get_config("nuscenes-unet-uncond")
    cfg.data.resolution = (16, 32)
    cfg.model.params.update(
        base_channels=8, num_residual_blocks=(1, 1, 1, 1), gn_num_groups=4,
        attn_num_heads=2,
    )
    return cfg


def _tiny_cond_cfg():
    cfg = get_config("nuscenes-box-layout-v6")
    cfg.data.resolution = (32, 64)
    cfg.condition_model.params["feature_map_size"] = (32, 64)
    return cfg


def test_uncond_export_roundtrip(tmp_path):
    cfg = _tiny_uncond_cfg()
    model, engine, _ = build_diffusion_training(cfg)
    H, W = cfg.data.resolution
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 2)), jnp.zeros((1,))
    )

    exported = export_sampler(
        cfg, params, batch_size=2, num_steps=2, mode="ddim", dtype=None,
    )
    art = save_artifact(
        tmp_path / "art", exported, meta={"config": "nuscenes-unet-uncond"}
    )
    fn, meta = load_artifact(art)
    assert meta["config"] == "nuscenes-unet-uncond"
    assert "cpu" in meta["platforms"]

    rng = jax.random.PRNGKey(3)
    got = fn(rng)
    ref_fn, conditional = build_sampler_fn(
        cfg, params, batch_size=2, num_steps=2, mode="ddim", dtype=None,
    )
    assert not conditional
    ref = ref_fn(rng)
    assert set(got.keys()) == {"depth", "xyz", "reflectance"}
    for k in got:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))


def _synthetic_condition(cfg, B):
    H, W = cfg.data.resolution
    L = cfg.condition_model.params["layout_length"]
    cc = cfg.condition_model.params.get("out_channels", 0)
    cond = {
        "scaled_gt_boxes": jnp.zeros((B, L, 9)),
        "gt_boxes_2d": jnp.zeros((B, L, 4)),
        "is_valid_obj": jnp.ones((B, L)),
    }
    if cc:
        cond["concat_cond"] = jnp.zeros((B, H, W, cc))
    return cond


def test_cond_export_takes_runtime_condition(tmp_path):
    """Conditional artifact: the condition is a per-request argument (not
    baked in) — different conditions must produce different samples."""
    cfg = _tiny_cond_cfg()
    B = 1
    models, engine, _ = build_diffusion_training(cfg)
    model, cond_model = models["model"], models["cond"]
    cond_ex = _synthetic_condition(cfg, B)
    H, W = cfg.data.resolution
    cond_params = cond_model.init(jax.random.PRNGKey(1), cond_ex)
    layout = cond_model.apply(cond_params, cond_ex)
    cd = {"time_condition": jnp.zeros((B,)), "other_condition": layout}
    model_params = model.init(
        jax.random.PRNGKey(2), jnp.zeros((B, H, W, 2)), cd
    )
    params = {"model": model_params, "cond": cond_params}

    with pytest.raises(ValueError, match="condition_example"):
        export_sampler(cfg, params, batch_size=B, num_steps=1, dtype=None)

    exported = export_sampler(
        cfg, params, batch_size=B, num_steps=1, mode="ddim", dtype=None,
        with_postprocess=False, condition_example=cond_ex,
    )
    art = save_artifact(tmp_path / "art", exported)
    fn, meta = load_artifact(art)

    # the condition is part of the exported signature (rng + condition tree)
    assert len(meta["in_avals"]) > 2

    rng = jax.random.PRNGKey(5)
    out_a = fn(rng, cond_ex)
    out_a2 = fn(rng, cond_ex)
    out_c = fn(jax.random.PRNGKey(6), cond_ex)
    assert out_a.shape == (B, H, W, 2)
    assert np.isfinite(np.asarray(out_a)).all()
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_a2))
    # NOTE: a *condition* perturbation is a no-op at random init — the cross
    # attention blocks end in zero-init proj_out (layout_unet.py:241) — so
    # liveness is asserted through the rng instead
    assert float(jnp.abs(out_a - out_c).max()) > 0


def test_cross_platform_lowering(tmp_path):
    """Exporting for ('tpu', 'cpu') from a CPU host must lower and
    serialize; the artifact records both platforms."""
    cfg = _tiny_uncond_cfg()
    model, _, _ = build_diffusion_training(cfg)
    H, W = cfg.data.resolution
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 2)), jnp.zeros((1,))
    )
    exported = export_sampler(
        cfg, params, batch_size=1, num_steps=1, dtype=jnp.bfloat16,
        with_postprocess=False, platforms=("tpu", "cpu"),
    )
    art = save_artifact(tmp_path / "art", exported)
    _, meta = load_artifact(art)
    assert set(meta["platforms"]) == {"tpu", "cpu"}
