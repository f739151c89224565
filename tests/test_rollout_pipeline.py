"""Integration: tiny tri-branch 4D rollout end-to-end (2 sampling steps, 2 frames)."""

import numpy as np

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.diffusion import CondContinuousDiffusion
from lidarcrafter_tpu.models.layout_encoder import LayoutTransformerEncoder
from lidarcrafter_tpu.models.layout_unet import LayoutUnetV1
from lidarcrafter_tpu.pipeline import TemporalRollout
from lidarcrafter_tpu.utils.lidar import LiDARUtility

H, W, L = 32, 128, 13


def _branch(out_channels_enc, extra_in, seed):
    enc = LayoutTransformerEncoder(
        feature_map_size=(H, W), layout_length=L, hidden_dim=32, output_dim=128,
        num_layers=1, num_heads=4, use_final_ln=True,
        num_classes_for_layout_object=9, mask_size_for_layout_object=32,
        used_condition_types=("obj_class", "obj_bbox", "is_valid_obj"),
        resolution_to_attention=(4, 8), out_channels=out_channels_enc,
    )
    unet = LayoutUnetV1(
        in_channels=2 + out_channels_enc, resolution=(H, W), model_channels=32,
        out_channels=2, num_res_blocks=1, attention_ds=(4,), encoder_channels=32,
        channel_mult=(1, 2, 4, 8), num_head_channels=16, image_size=H,
        coords_encoding=None,
    )
    cond = {
        "scaled_gt_boxes": jnp.zeros((1, L, 9)),
        "gt_boxes_2d": jnp.zeros((1, L, 4)),
        "is_valid_obj": jnp.ones((1, L)),
        "concat_cond": jnp.zeros((1, H, W, 10)),
    }
    if extra_in:
        cond["autoregressive_cond"] = jnp.zeros((1, H, W, 1))
    enc_params = enc.init(jax.random.PRNGKey(seed), cond)
    layout = enc.apply(enc_params, cond)
    cd = {"time_condition": jnp.zeros((1,)), "other_condition": layout}
    unet_params = unet.init(jax.random.PRNGKey(seed + 1), jnp.zeros((1, H, W, 2)), cd)
    params = {"model": unet_params, "cond": enc_params}
    engine = CondContinuousDiffusion(
        apply_fn=lambda p, x, c: unet.apply(p["model"], x, c),
        cond_apply_fn=lambda p, d: enc.apply(p["cond"], d),
        sampling_shape=(H, W, 2),
        cond_mode="concat",
    )
    return engine, params


def test_temporal_rollout_smoke():
    cond_engine, cond_params = _branch(10, extra_in=False, seed=0)
    auto_engine, auto_params = _branch(11, extra_in=True, seed=10)
    utils = LiDARUtility.create((H, W), "log_depth", 1.45, 80.0)

    pipeline = TemporalRollout(
        cond_engine=cond_engine, cond_params=cond_params,
        autoreg_engine=auto_engine, autoreg_params=auto_params,
        lidar_utils=utils, num_sampling_steps=2, sampling_mode="ddim",
        max_points_per_obj=64,
    )

    rng = np.random.RandomState(0)
    K = 3
    boxes0 = np.zeros((K, 7), np.float32)
    boxes0[:, 0] = [10, -12, 20]
    boxes0[:, 1] = [4, -6, -2]
    boxes0[:, 3:6] = 3.0
    classes = np.arange(1, K + 1, dtype=np.float32)
    gt_fut_trajs = rng.uniform(0.1, 0.6, (K + 1, 6, 2)).astype(np.float32)

    first_batch = {
        "scaled_gt_boxes": jnp.asarray(rng.rand(1, L, 9).astype(np.float32)),
        "gt_boxes_2d": jnp.asarray(rng.rand(1, L, 4).astype(np.float32)),
        "is_valid_obj": jnp.ones((1, L)),
        "concat_cond": jnp.asarray(rng.rand(1, H, W, 10).astype(np.float32)),
    }

    frames = pipeline.rollout(
        first_batch, gt_fut_trajs, boxes0, classes,
        jax.random.PRNGKey(0), num_frames=2, interp_M=8,
    )
    assert len(frames) == 3
    for f in frames:
        assert f.shape == (1, H, W, 2)
        assert np.isfinite(f).all()
