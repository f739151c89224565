"""Layout/conditional branch: shape+jit tests for encoder, layout UNet, cond engine,
scene-graph GCN, UNet1D, point UNet."""

import numpy as np

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.diffusion.conditional import CondContinuousDiffusion
from lidarcrafter_tpu.models.graph import GraphTripleConvNet
from lidarcrafter_tpu.models.layout_encoder import LayoutTransformerEncoder, image_patch_bboxes
from lidarcrafter_tpu.models.layout_unet import LayoutUnetV1
from lidarcrafter_tpu.models.point_unet import ObjectGenEncoder, PointUNet, nerf_fourier_embed
from lidarcrafter_tpu.models.scene_graph import SceneGraph
from lidarcrafter_tpu.models.unet_1d import UNet1DModel

B, L = 2, 13
H, W = 32, 128  # narrow azimuth for test speed


def _cond_inputs(rng=0):
    r = np.random.RandomState(rng)
    return {
        "scaled_gt_boxes": jnp.asarray(r.rand(B, L, 9).astype(np.float32)),
        "gt_boxes_2d": jnp.asarray(r.rand(B, L, 4).astype(np.float32)),
        "is_valid_obj": jnp.asarray((r.rand(B, L) > 0.3).astype(np.float32)),
        "concat_cond": jnp.asarray(r.rand(B, H, W, 11).astype(np.float32)),
    }


def _encoder():
    return LayoutTransformerEncoder(
        feature_map_size=(H, W),
        layout_length=L,
        hidden_dim=64,
        output_dim=256,
        num_layers=2,
        num_heads=4,
        use_final_ln=True,
        num_classes_for_layout_object=9,
        mask_size_for_layout_object=32,
        used_condition_types=("obj_class", "obj_bbox", "is_valid_obj"),
        resolution_to_attention=(4, 8),
        out_channels=11,
    )


def test_image_patch_bboxes_row_major():
    p = image_patch_bboxes((8, 16), 4)  # grid 2 x 4
    assert p.shape == (8, 4)
    # first row sweeps W
    np.testing.assert_allclose(p[0], [0.0, 0.0, 0.25, 0.5])
    np.testing.assert_allclose(p[1], [0.25, 0.0, 0.5, 0.5])
    np.testing.assert_allclose(p[4], [0.0, 0.5, 0.25, 1.0])


def test_layout_encoder_outputs():
    enc = _encoder()
    cond = _cond_inputs()
    params = enc.init(jax.random.PRNGKey(0), cond)
    out = jax.jit(enc.apply)(params, cond)
    assert out["xf_out"].shape == (B, L, 64)
    assert out["xf_proj"].shape == (B, 256)
    assert out["obj_class_embedding"].shape == (B, L, 64)
    assert out["obj_bbox_embedding"].shape == (B, L, 64)
    # ds=4 → resolution key 32/4=8, grid (H/4)x(W/4)
    assert out["image_patch_bbox_embedding_for_resolution8"].shape == (
        B, (H // 4) * (W // 4), 64,
    )
    assert out["key_padding_mask"].shape == (B, L)
    assert out["concat_cond"].shape == (B, H, W, 11)


def test_layout_unet_forward_and_cond_engine():
    enc = _encoder()
    unet = LayoutUnetV1(
        in_channels=2 + 11,  # depth+reflectance + concat cond channels
        resolution=(H, W),
        model_channels=64,  # temb = 4x = 256 = encoder output_dim
        out_channels=2,
        num_res_blocks=1,
        attention_ds=(4, 8),
        encoder_channels=64,
        channel_mult=(1, 2, 4, 8),
        num_head_channels=16,
        image_size=H,
        use_ray_angle_coords=True,
    )
    cond = _cond_inputs()
    enc_params = enc.init(jax.random.PRNGKey(0), cond)
    layout = enc.apply(enc_params, cond)
    x = jnp.zeros((B, H, W, 2))
    cd = {"time_condition": jnp.zeros((B,)), "other_condition": layout}
    unet_params = unet.init(jax.random.PRNGKey(1), x, cd)
    out = jax.jit(lambda p, x, cd: unet.apply(p, x, cd))(unet_params, x, cd)
    assert out.shape == (B, H, W, 2)
    assert np.isfinite(np.asarray(out)).all()

    # conditional engine end-to-end: loss + 2-step conditioned ddim sample
    params = {"model": unet_params, "cond": enc_params}
    engine = CondContinuousDiffusion(
        apply_fn=lambda p, xt, c: unet.apply(p["model"], xt, c),
        cond_apply_fn=lambda p, d: enc.apply(p["cond"], d),
        sampling_shape=(H, W, 2),
        cond_mode="concat",
    )
    # concat mode: the 'concat_cond' is part of the encoder outputs (a dict),
    # so the concat happens inside the model via layout['concat_cond'].
    input_dict = {"x_0": jnp.zeros((B, H, W, 2)), **{"k": 0}}
    input_dict.update(cond)
    loss = engine.loss(params, jax.random.PRNGKey(2), {"x_0": input_dict["x_0"], **cond})
    assert np.isfinite(float(loss))
    sample = engine.sample(
        params, jax.random.PRNGKey(3), cond, batch_size=B, num_steps=2, mode="ddim"
    )
    assert sample.shape == (B, H, W, 2)
    assert np.isfinite(np.asarray(sample)).all()


def test_scene_graph_gcn():
    N, T = 10, 14
    r = np.random.RandomState(0)
    objs = jnp.asarray(r.randint(0, 9, N))
    triples = jnp.asarray(
        np.stack([r.randint(0, N, T), r.randint(0, 16, T), r.randint(0, N, T)], 1)
    )
    text = jnp.asarray(r.randn(N, 512).astype(np.float32))
    rel = jnp.asarray(r.randn(T, 512).astype(np.float32))
    edge_mask = jnp.asarray(np.arange(T) < 12)
    sg = SceneGraph(num_objs=9, num_preds=16, embedding_dim=64, gconv_num_layers=2)
    variables = sg.init(jax.random.PRNGKey(0), objs, triples, text, rel, edge_mask=edge_mask)
    latent, obj_embed = sg.apply(variables, objs, triples, text, rel, edge_mask=edge_mask)
    assert latent.shape == (N, 64 * 2 + 512)
    assert obj_embed.shape == (N, 512 + 128)
    # added nodes must produce different latents than baseline
    added = jnp.zeros((N,), bool).at[3].set(True)
    latent2, _ = sg.apply(
        variables, objs, triples, text, rel, added_mask=added,
        rng=jax.random.PRNGKey(5), edge_mask=edge_mask,
    )
    assert not np.allclose(np.asarray(latent), np.asarray(latent2))


def test_masked_edges_do_not_leak():
    """A padded edge must not affect node outputs."""
    N, T = 6, 4
    r = np.random.RandomState(1)
    objs = jnp.asarray(r.randint(0, 9, N))
    text = jnp.asarray(r.randn(N, 512).astype(np.float32))
    base_triples = np.stack([[0, 1, 2], [3, 1, 4], [2, 0, 5], [0, 2, 3]]).astype(np.int32)
    rel = jnp.asarray(r.randn(T, 512).astype(np.float32))
    sg = SceneGraph(num_objs=9, num_preds=16, embedding_dim=32, gconv_num_layers=2)
    mask_full = jnp.asarray([True, True, True, False])
    variables = sg.init(
        jax.random.PRNGKey(0), objs, jnp.asarray(base_triples), text, rel,
        edge_mask=mask_full,
    )
    out1, _ = sg.apply(variables, objs, jnp.asarray(base_triples), text, rel, edge_mask=mask_full)
    # change the masked edge arbitrarily
    changed = base_triples.copy()
    changed[3] = [5, 9, 1]
    rel2 = np.asarray(rel).copy()
    rel2[3] = 99.0
    out2, _ = sg.apply(
        variables, objs, jnp.asarray(changed), text, jnp.asarray(rel2), edge_mask=mask_full
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_unet_1d_forward():
    N, T = 8, 10
    r = np.random.RandomState(2)
    box_t = jnp.asarray(r.randn(N, 20).astype(np.float32))
    obj_embed = jnp.asarray(r.randn(N, 640).astype(np.float32))
    triples = jnp.asarray(
        np.stack([r.randint(0, N, T), r.randint(0, 16, T), r.randint(0, N, T)], 1)
    )
    model = UNet1DModel(in_channels=20, model_channels=64, out_channels=20, num_heads=8)
    cond = {
        "time_condition": jnp.zeros((N,)),
        "other_condition": {"preds": triples, "uc_b": obj_embed, "edge_mask": jnp.ones((T,), bool)},
    }
    variables = model.init(jax.random.PRNGKey(0), box_t, cond)
    out = jax.jit(
        lambda v, b, c: model.apply(v, b, c)
    )(variables, box_t, cond)
    assert out.shape == (N, 20)
    assert np.isfinite(np.asarray(out)).all()


def test_point_unet_and_object_encoder():
    r = np.random.RandomState(3)
    coords = jnp.asarray(r.randn(B, 64, 4).astype(np.float32))
    enc = ObjectGenEncoder(input_dim=6)
    input_dict = {
        "fg_encoding_box": jnp.asarray(r.randn(B, 6).astype(np.float32)),
        "fg_class": jnp.asarray(r.randint(0, 8, B)),
        "fg_text_features": jnp.asarray(r.randn(8, 512).astype(np.float32)),
    }
    enc_params = enc.init(jax.random.PRNGKey(0), input_dict)
    cond_feat = enc.apply(enc_params, input_dict)
    assert cond_feat.shape == (B, 768)

    punet = PointUNet(point_dim=4, cond_dims=768)
    cd = {"time_condition": jnp.zeros((B,)), "other_condition": cond_feat}
    p = punet.init(jax.random.PRNGKey(1), coords, cd)
    out = jax.jit(lambda p, c, cd: punet.apply(p, c, cd))(p, coords, cd)
    assert out.shape == (B, 64, 4)

    # NeRF embed: [x, sin(x), cos(x), sin(2x), cos(2x), ...]
    x = jnp.asarray([[1.0, 2.0]])
    e = np.asarray(nerf_fourier_embed(x, 2))
    np.testing.assert_allclose(
        e[0],
        [1, 2, np.sin(1), np.sin(2), np.cos(1), np.cos(2),
         np.sin(2), np.sin(4), np.cos(2), np.cos(4)],
        rtol=1e-6,
    )


def test_layout_encoder_v5():
    from lidarcrafter_tpu.models.layout_encoder import LayoutTransformerEncoderV5

    enc = LayoutTransformerEncoderV5(
        feature_map_size=(H, W), layout_length=L, hidden_dim=64, output_dim=256,
        num_layers=1, num_heads=4, use_final_ln=True,
        num_classes_for_layout_object=9, mask_size_for_layout_object=32,
        used_condition_types=("obj_class", "obj_bbox", "is_valid_obj"),
        resolution_to_attention=(4,), out_channels=10,
    )
    r = np.random.RandomState(0)
    cond = {
        "scaled_gt_boxes": jnp.asarray(r.rand(B, L, 9).astype(np.float32)),
        "gt_boxes_2d": jnp.asarray(r.rand(B, L, 4).astype(np.float32)),
        "is_valid_obj": jnp.ones((B, L)),
        "fg_encoding_box": jnp.asarray(r.rand(B, L, 8).astype(np.float32)),
        "fg_text_features": jnp.asarray(r.randn(9, 512).astype(np.float32)),
        "concat_cond": jnp.zeros((B, H, W, 10)),
    }
    params = enc.init(jax.random.PRNGKey(0), cond)
    out = enc.apply(params, cond)
    assert out["xf_out"].shape == (B, L, 64)
    assert out["xf_proj"].shape == (B, 256)
    assert out["concat_cond"].shape == (B, H, W, 10)


def test_layout_unet_v0_glide_attention_path():
    """layout_unet (v0): same trunk with GLIDE attention blocks
    (cf. ``layout_unet.py`` vs ``layout_unet_v1.py`` in the reference)."""
    enc = _encoder()
    unet = LayoutUnetV1(
        in_channels=2 + 11,
        resolution=(H, W),
        model_channels=64,
        out_channels=2,
        num_res_blocks=1,
        attention_ds=(4, 8),
        encoder_channels=64,
        channel_mult=(1, 2, 4, 8),
        num_head_channels=16,
        image_size=H,
        attention_block_type="GLIDEAttentionBlock",
    )
    cond = _cond_inputs()
    enc_params = enc.init(jax.random.PRNGKey(0), cond)
    layout = enc.apply(enc_params, cond)
    x = jnp.zeros((B, H, W, 2))
    cd = {"time_condition": jnp.zeros((B,)), "other_condition": layout}
    params = unet.init(jax.random.PRNGKey(1), x, cd)
    out = unet.apply(params, x, cd)
    assert out.shape == (B, H, W, 2)
    assert np.isfinite(np.asarray(out)).all()
    # encoder tokens reach the K/V path: changing xf_out changes the output
    # (perturb params away from the zero-init output conv first)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * np.random.RandomState(3).randn(*a.shape).astype(a.dtype),
        params,
    )
    out1 = unet.apply(params, x, cd)
    layout2 = dict(layout)
    layout2["xf_out"] = layout["xf_out"] + 1.0
    out2 = unet.apply(params, x, dict(cd, other_condition=layout2))
    assert float(jnp.abs(out1 - out2).max()) > 0
