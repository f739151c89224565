"""Torch checkpoint ingestion: full-model numerical parity.

Builds the reference torch EfficientUNet (random init), converts its
state_dict to flax params, and compares forward outputs — the strongest
possible architecture+ingestion parity check.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.models.efficient_unet import EfficientUNet
from lidarcrafter_tpu.utils.torch_ckpt import convert_efficient_unet

REF = Path("/root/reference")


def _load_ref_efficient_unet():
    pkg = types.ModuleType("refunets")
    pkg.__path__ = [str(REF / "lidargen/models/unets")]
    sys.modules["refunets"] = pkg
    for name in ("encoding", "ops", "efficient_unet"):
        spec = importlib.util.spec_from_file_location(
            f"refunets.{name}", REF / f"lidargen/models/unets/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refunets.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return sys.modules["refunets.efficient_unet"]


ref_eu = _load_ref_efficient_unet()

H, W = 32, 64
KW = dict(
    in_channels=2,
    resolution=(H, W),
    base_channels=16,
    channel_multiplier=(1, 2, 4, 8),
    num_residual_blocks=(1, 1, 1, 1),
    gn_num_groups=4,
    attn_num_heads=4,
    coords_encoding="fourier_features",
    ring=True,
)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tmodel = ref_eu.EfficientUNet(**KW).eval()
    # make zero-inited parts nontrivial so parity is meaningful
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
    jmodel = EfficientUNet(**KW)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_efficient_unet(sd, attn_num_heads=KW["attn_num_heads"])
    return tmodel, jmodel, params


def test_full_forward_parity(pair):
    tmodel, jmodel, params = pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 2, H, W).astype(np.float32)
    t = np.array([-3.0, 4.0], np.float32)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    got = jmodel.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_param_tree_is_complete(pair):
    _, jmodel, params = pair
    ref_init = jmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 2)), jnp.zeros((1,))
    )
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_init)
    got_leaves = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    )
    assert len(ref_leaves) == len(got_leaves)
    for path, leaf in ref_leaves:
        key = jax.tree_util.keystr(path)
        assert key in got_leaves, f"missing {key}"
        assert got_leaves[key].shape == leaf.shape, key


def _fake_layout_unet_sd(mc, cm, nrb, attn_ds, enc_ch, in_ch, out_ch, temb, seed=0):
    """Torch-named state_dict replaying layout_unet_v1's construction."""
    r = np.random.RandomState(seed)

    sd = {}

    def lin(p, i, o):
        sd[f"{p}.weight"] = r.randn(o, i).astype(np.float32)
        sd[f"{p}.bias"] = r.randn(o).astype(np.float32)

    def gn(p, c):
        sd[f"{p}.weight"] = r.rand(c).astype(np.float32)
        sd[f"{p}.bias"] = r.randn(c).astype(np.float32)

    def conv3(p, i, o):
        sd[f"{p}.weight"] = r.randn(o, i, 3, 3).astype(np.float32) * 0.05
        sd[f"{p}.bias"] = r.randn(o).astype(np.float32)

    def conv1(p, i, o):
        sd[f"{p}.weight"] = r.randn(o, i, 1).astype(np.float32) * 0.05
        sd[f"{p}.bias"] = r.randn(o).astype(np.float32)

    def res(p, ci, co):
        gn(f"{p}.in_layers.0", ci)
        conv3(f"{p}.in_layers.2", ci, co)
        lin(f"{p}.emb_layers.1", temb, 2 * co)
        gn(f"{p}.out_layers.0", co)
        conv3(f"{p}.out_layers.3", co, co)
        if ci != co:
            # skip is a 2D 1x1 conv: (O, I, 1, 1)
            sd[f"{p}.skip_connection.weight"] = r.randn(co, ci, 1, 1).astype(np.float32)
            sd[f"{p}.skip_connection.bias"] = r.randn(co).astype(np.float32)

    def attn(p, ch):
        gn(f"{p}.norm_for_qkv", ch)
        conv1(f"{p}.qkv_projector", ch, 3 * ch)
        conv1(f"{p}.layout_content_embedding_projector", enc_ch, 2 * ch)
        conv1(f"{p}.layout_position_embedding_projector", enc_ch, ch)
        gn(f"{p}.norm_for_obj_class_embedding", enc_ch)
        gn(f"{p}.norm_for_layout_positional_embedding", ch)
        gn(f"{p}.norm_for_image_patch_positional_embedding", ch)
        conv1(f"{p}.proj_out", ch, ch)

    lin("time_embed.0", mc, temb)
    lin("time_embed.2", temb, temb)
    conv3("input_blocks.0.0", in_ch, mc)
    ds, idx, ch = 1, 1, mc
    for level, mult in enumerate(cm):
        for i in range(nrb):
            res(f"input_blocks.{idx}.0", ch, mult * mc)
            ch = mult * mc
            if ds in attn_ds:
                attn(f"input_blocks.{idx}.1", ch)
            idx += 1
        if level != len(cm) - 1:
            res(f"input_blocks.{idx}.0", ch, ch)
            idx += 1
            ds *= 2
    res("middle_block.0", ch, ch)
    attn("middle_block.1", ch)
    res("middle_block.2", ch, ch)
    idx = 0
    skips = [mc] + [mult * mc for mult in cm for _ in range(nrb)]
    # reference skip channel bookkeeping: replay with a stack
    stack = [mc]
    d2 = 1
    chp = mc
    for level, mult in enumerate(cm):
        for i in range(nrb):
            chp = mult * mc
            stack.append(chp)
        if level != len(cm) - 1:
            stack.append(chp)
            d2 *= 2
    for level in reversed(range(len(cm))):
        mult = cm[level]
        for i in range(nrb + 1):
            ich = stack.pop()
            res(f"output_blocks.{idx}.0", ch + ich, mult * mc)
            ch = mult * mc
            off = 1
            if ds in attn_ds:
                attn(f"output_blocks.{idx}.{off}", ch)
                off += 1
            if level and i == nrb:
                res(f"output_blocks.{idx}.{off}", ch, ch)
                ds //= 2
            idx += 1
    gn("out.0", ch)
    conv3("out.2", ch, out_ch)
    return sd


def test_convert_layout_unet_tree_and_forward():
    import chex

    from lidarcrafter_tpu.models.layout_encoder import LayoutTransformerEncoder
    from lidarcrafter_tpu.models.layout_unet import LayoutUnetV1
    from lidarcrafter_tpu.utils.torch_ckpt import (
        convert_layout_encoder,
        convert_layout_unet,
    )

    H, W, B, L = 32, 64, 1, 13
    enc = LayoutTransformerEncoder(
        feature_map_size=(H, W), layout_length=L, hidden_dim=64, output_dim=256,
        num_layers=2, num_heads=4, use_final_ln=True,
        num_classes_for_layout_object=9, mask_size_for_layout_object=32,
        used_condition_types=("obj_class", "obj_bbox", "is_valid_obj"),
        resolution_to_attention=(4, 8), out_channels=11,
    )
    unet = LayoutUnetV1(
        in_channels=13, resolution=(H, W), model_channels=64, out_channels=2,
        num_res_blocks=1, attention_ds=(4, 8), encoder_channels=64,
        channel_mult=(1, 2, 4, 8), num_head_channels=16, image_size=H,
        use_ray_angle_coords=True,
    )
    r = np.random.RandomState(0)
    cond = {
        "scaled_gt_boxes": jnp.asarray(r.rand(B, L, 9).astype(np.float32)),
        "gt_boxes_2d": jnp.asarray(r.rand(B, L, 4).astype(np.float32)),
        "is_valid_obj": jnp.ones((B, L), jnp.float32),
        "concat_cond": jnp.zeros((B, H, W, 11)),
    }
    ep_ref = enc.init(jax.random.PRNGKey(0), cond)

    # fake torch encoder sd
    sd_e = {}
    re_ = np.random.RandomState(1)
    def elin(p, i, o):
        sd_e[f"{p}.weight"] = re_.randn(o, i).astype(np.float32)
        sd_e[f"{p}.bias"] = re_.randn(o).astype(np.float32)
    elin("transformer_proj", 64, 256)
    sd_e["obj_class_embedding.weight"] = re_.randn(9, 64).astype(np.float32)
    elin("obj_bbox_embedding", 8, 64)
    elin("obj_bbox_2d_embedding", 4, 64)
    sd_e["final_ln.weight"] = np.ones(64, np.float32)
    sd_e["final_ln.bias"] = np.zeros(64, np.float32)
    for n in range(2):
        p = f"transform.resblocks.{n}"
        elin(f"{p}.attn.c_qkv", 64, 192)
        elin(f"{p}.attn.c_proj", 64, 64)
        sd_e[f"{p}.ln_1.weight"] = np.ones(64, np.float32)
        sd_e[f"{p}.ln_1.bias"] = np.zeros(64, np.float32)
        sd_e[f"{p}.ln_2.weight"] = np.ones(64, np.float32)
        sd_e[f"{p}.ln_2.bias"] = np.zeros(64, np.float32)
        elin(f"{p}.mlp.c_fc", 64, 256)
        elin(f"{p}.mlp.c_proj", 256, 64)
    ep = convert_layout_encoder(sd_e)
    chex.assert_trees_all_equal_shapes(ep_ref, ep)

    layout = enc.apply(ep, cond)
    x = jnp.zeros((B, H, W, 2))
    cd = {"time_condition": jnp.zeros((B,)), "other_condition": layout}
    up_ref = unet.init(jax.random.PRNGKey(1), x, cd)

    sd_u = _fake_layout_unet_sd(
        mc=64, cm=(1, 2, 4, 8), nrb=1, attn_ds=(4, 8), enc_ch=64,
        in_ch=35, out_ch=2, temb=256,
    )
    up = convert_layout_unet(sd_u, channel_mult=(1, 2, 4, 8), num_res_blocks=1,
                             attention_ds=(4, 8))
    chex.assert_trees_all_equal_shapes(up_ref, up)
    out = unet.apply(up, x, cd)
    assert out.shape == (B, H, W, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_unet_1d_tree_and_forward():
    import chex

    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training.factory import build_layout_training
    from lidarcrafter_tpu.utils.torch_ckpt import convert_unet_1d

    cfg = get_config("nuscenes-layout")
    models, engine, _ = build_layout_training(cfg)
    m = models["model"]
    N, E = 8, 10
    cd = {
        "time_condition": jnp.zeros((N,)),
        "other_condition": {
            "preds": jnp.zeros((E, 3), jnp.int32),
            "uc_b": jnp.zeros((N, 512)),
            "edge_mask": jnp.ones((E,), bool),
        },
    }
    ref = m.init(jax.random.PRNGKey(0), jnp.zeros((N, 20)), cd)

    r = np.random.RandomState(0)
    mc, temb, ctx, gd, gh = 512, 2048, 1280, 64, 256
    sd = {}

    def lin(p, i, o, bias=True):
        sd[f"{p}.weight"] = r.randn(o, i).astype(np.float32) * 0.02
        if bias:
            sd[f"{p}.bias"] = r.randn(o).astype(np.float32) * 0.02

    def gn(p, c):
        sd[f"{p}.weight"] = np.ones(c, np.float32)
        sd[f"{p}.bias"] = np.zeros(c, np.float32)

    def bn(p, c):
        gn(p, c)
        sd[f"{p}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{p}.running_var"] = np.ones(c, np.float32)

    def conv(p, i, o, k=3):
        sd[f"{p}.weight"] = r.randn(o, i, k).astype(np.float32) * 0.02
        sd[f"{p}.bias"] = r.randn(o).astype(np.float32) * 0.02

    def res(p, ci, co):
        gn(f"{p}.in_layers.0", ci)
        conv(f"{p}.in_layers.2", ci, co)
        lin(f"{p}.emb_layers.1", temb, co)
        gn(f"{p}.out_layers.0", co)
        conv(f"{p}.out_layers.3", co, co)
        if ci != co:
            conv(f"{p}.skip_connection", ci, co, k=1)

    def attn(p):
        gn(f"{p}.norm", mc)
        conv(f"{p}.proj_in", mc, mc, k=1)
        conv(f"{p}.proj_out", mc, mc, k=1)
        b = f"{p}.transformer_blocks.0"
        for a, kvdim in (("attn1", mc), ("attn2", ctx)):
            lin(f"{b}.{a}.to_q", mc, mc, bias=False)
            lin(f"{b}.{a}.to_k", kvdim, mc, bias=False)
            lin(f"{b}.{a}.to_v", kvdim, mc, bias=False)
            lin(f"{b}.{a}.to_out.0", mc, mc)
        lin(f"{b}.ff.net.0.proj", mc, 2 * 4 * mc)
        lin(f"{b}.ff.net.2", 4 * mc, mc)
        for n in ("norm1", "norm2", "norm3"):
            gn(f"{b}.{n}", mc)

    lin("time_embed.0", mc, temb)
    lin("time_embed.2", temb, temb)
    conv("input_blocks.0.0", 20, mc)
    lin("box_embeddings", 20, gd)
    lin("box_time_emb", temb, gd)
    sd["pred_embeddings.weight"] = r.randn(16, 2 * gd).astype(np.float32)
    do, dp = 640, 2 * gd
    for i in range(5):
        out_dim = 1280 if i == 4 else do  # last layer projects to concat_dim
        g = f"box_graph_cov.gconvs.{i}"
        lin(f"{g}.net1.0", 2 * do + dp, gh)
        bn(f"{g}.net1.1", gh)
        lin(f"{g}.net1.3", gh, 2 * gh + dp)
        bn(f"{g}.net1.4", 2 * gh + dp)
        lin(f"{g}.net2.0", gh, gh)
        bn(f"{g}.net2.1", gh)
        lin(f"{g}.net2.3", gh, out_dim)
        bn(f"{g}.net2.4", out_dim)
        lin(f"{g}.linear_projection", do, out_dim)
        lin(f"{g}.linear_projection_pred", dp, dp)

    ds, idx = 1, 1
    cm, nrb, attn_ds = (1, 1, 1, 1), 2, (4, 2)
    for level in range(4):
        for i in range(nrb):
            res(f"input_blocks.{idx}.0", mc, mc)
            if ds in attn_ds:
                attn(f"input_blocks.{idx}.1")
            idx += 1
        if level != 3:
            conv(f"input_blocks.{idx}.0.op", mc, mc)
            idx += 1
            ds *= 2
    res("middle_block.0", mc, mc)
    attn("middle_block.1")
    res("middle_block.2", mc, mc)
    idx = 0
    for level in reversed(range(4)):
        for i in range(nrb + 1):
            res(f"output_blocks.{idx}.0", 2 * mc, mc)
            off = 1
            if ds in attn_ds:
                attn(f"output_blocks.{idx}.{off}")
                off += 1
            if level and i == nrb:
                conv(f"output_blocks.{idx}.{off}.conv", mc, mc)
                ds //= 2
            idx += 1
    gn("out.0", mc)
    conv("out.2", mc, 20)

    got = convert_unet_1d(sd)
    chex.assert_trees_all_equal_shapes(ref, got)
    out = m.apply(got, jnp.zeros((N, 20)), cd)
    assert out.shape == (N, 20)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_point_unet_and_encoder_and_scene_graph():
    import chex

    from lidarcrafter_tpu.models.point_unet import ObjectGenEncoder, PointUNet
    from lidarcrafter_tpu.models.scene_graph import SceneGraph
    from lidarcrafter_tpu.utils.torch_ckpt import (
        convert_object_gen_encoder,
        convert_point_unet,
        convert_scene_graph,
    )

    r = np.random.RandomState(0)
    sd = {}

    def lin(p, i, o, bias=True):
        sd[f"{p}.weight"] = r.randn(o, i).astype(np.float32) * 0.05
        if bias:
            sd[f"{p}.bias"] = r.randn(o).astype(np.float32) * 0.05

    # PointUNet (point_dim=4, cond 11 → +3 time channels)
    dims = [4, 128, 256, 512, 256, 128, 4]
    for i in range(6):
        lin(f"layers.{i}.fea_layer", dims[i], dims[i + 1])
        lin(f"layers.{i}.cond_bias", 14, dims[i + 1], bias=False)
        lin(f"layers.{i}.cond_gate", 14, dims[i + 1])
    m = PointUNet(point_dim=4, cond_dims=11)
    ref = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 4)),
                 {"time_condition": jnp.zeros((2,)),
                  "other_condition": jnp.zeros((2, 11))})
    got = convert_point_unet(sd)
    chex.assert_trees_all_equal_shapes(ref, got)
    out = m.apply(got, jnp.zeros((2, 16, 4)),
                  {"time_condition": jnp.zeros((2,)),
                   "other_condition": jnp.zeros((2, 11))})
    assert out.shape == (2, 16, 4)

    # ObjectGenEncoder
    sd = {}
    lin("bbox_proj", 54, 768)
    lin("second_linear.0", 1280, 512)
    lin("second_linear.2", 512, 512)
    lin("second_linear.4", 512, 768)
    e = ObjectGenEncoder()
    inp = {"fg_encoding_box": jnp.zeros((2, 6)),
           "fg_class": jnp.zeros((2,), jnp.int32),
           "fg_text_features": jnp.zeros((8, 512))}
    ref = e.init(jax.random.PRNGKey(0), inp)
    got = convert_object_gen_encoder(sd)
    chex.assert_trees_all_equal_shapes(ref, got)
    assert np.isfinite(np.asarray(e.apply(got, inp))).all()

    # SceneGraph (mlp_normalization='none')
    sd = {}
    gd, add = 64, 512
    sd["obj_embeddings_ec.weight"] = r.randn(10, 2 * gd).astype(np.float32)
    sd["pred_embeddings_ec.weight"] = r.randn(16, 2 * gd).astype(np.float32)
    sd["pred_embeddings_man_dc.weight"] = r.randn(16, 2 * gd).astype(np.float32)
    do = 2 * gd + add          # 640: ec in/out and manipulation output dim
    dm = do + gd + do          # 1344: manipulation obj input (latent+flag+emb)
    gh = 4 * gd                # 256: gconv hidden
    for name, din in (("gconv_net_ec", do), ("gconv_net_manipulation", dm)):
        for i in range(5):
            g = f"{name}.gconvs.{i}"
            out_d = do if i == 4 else din  # intermediate layers chain din
            lin(f"{g}.net1.0", 2 * din + do, gh)
            lin(f"{g}.net1.2", gh, 2 * gh + do)
            lin(f"{g}.net2.0", gh, gh)
            lin(f"{g}.net2.2", gh, out_d)
    sg = SceneGraph(num_objs=9, num_preds=16)
    N, E = 6, 8
    args = (jnp.zeros((N,), jnp.int32), jnp.zeros((E, 3), jnp.int32),
            jnp.zeros((N, 512)), jnp.zeros((E, 512)))
    ref = sg.init(jax.random.PRNGKey(0), *args, edge_mask=jnp.ones((E,), bool))
    got = convert_scene_graph(sd)
    chex.assert_trees_all_equal_shapes(ref, got)
    latent, obj_embed = sg.apply(got, *args, edge_mask=jnp.ones((E,), bool))
    assert np.isfinite(np.asarray(latent)).all()


def test_unet_1d_numerical_parity_with_reference():
    """Execute the reference torch UNet1DModel and compare forwards through
    the converted weights — full numerical ingestion parity for the layout
    1D branch."""
    # stub omegaconf (only touched for ListConfig isinstance checks)
    om = types.ModuleType("omegaconf")
    om_list = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    om_list.ListConfig = ListConfig
    om.listconfig = om_list
    sys.modules.setdefault("omegaconf", om)
    sys.modules.setdefault("omegaconf.listconfig", om_list)

    pkg = sys.modules["refunets"]
    for name in ("ldm_diffusion_util", "graph", "layers", "nn", "attention",
                 "basic", "unet_1d"):
        if f"refunets.{name}" in sys.modules:
            continue
        path = REF / f"lidargen/models/unets/{name}.py"
        if not path.exists():
            continue
        spec = importlib.util.spec_from_file_location(f"refunets.{name}", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refunets.{name}"] = mod
        try:
            spec.loader.exec_module(mod)
        except Exception as e:  # pragma: no cover - optional dep missing
            pytest.skip(f"cannot load reference {name}: {e}")
        setattr(pkg, name, mod)
    ref_u1d = sys.modules["refunets.unet_1d"]

    torch.manual_seed(0)
    # production nuscenes-layout width: 512ch → 16-element GroupNorm groups
    # (tiny widths make 2-element groups whose near-zero variance amplifies
    # fp noise by ~1/sqrt(eps) per block — not representative)
    kw = dict(in_channels=20, model_channels=512, out_channels=20,
              num_res_blocks=2, attention_resolutions=(4, 2),
              channel_mult=(1, 1, 1, 1), num_heads=8,
              use_spatial_transformer=True, transformer_depth=1,
              conditioning_key='crossattn', concat_dim=1280,
              crossattn_dim=1280, using_clip=True, enable_t_emb=True)
    tmodel = ref_u1d.UNet1DModel(**kw).eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
    # put BN in eval with nontrivial stats
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    from lidarcrafter_tpu.models.unet_1d import UNet1DModel
    from lidarcrafter_tpu.utils.torch_ckpt import convert_unet_1d

    jmodel = UNet1DModel(**{k: v for k, v in kw.items()
                            if k not in ("conv_resample",)})
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_unet_1d(sd)

    r = np.random.RandomState(0)
    N, E = 8, 10
    box_t = r.randn(N, 20).astype(np.float32)
    tsteps = r.rand(N).astype(np.float32)
    uc_b = r.randn(N, 640).astype(np.float32)  # SceneGraph manipulator dim
    triples = np.stack([r.randint(0, N, E), r.randint(0, 16, E),
                        r.randint(0, N, E)], 1).astype(np.int64)

    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(box_t),
            {"time_condition": torch.from_numpy(tsteps),
             "other_condition": {"preds": torch.from_numpy(triples),
                                 "uc_b": torch.from_numpy(uc_b),
                                 "c_b": None}},
        ).numpy()

    got = jmodel.apply(
        params, jnp.asarray(box_t),
        {"time_condition": jnp.asarray(tsteps),
         "other_condition": {"preds": jnp.asarray(triples.astype(np.int32)),
                             "uc_b": jnp.asarray(uc_b),
                             "edge_mask": jnp.ones((E,), bool)}},
    )
    # Exact parity of the GCN message passing (the conditioning path):
    with torch.no_grad():
        emb_t = tmodel.time_embed(
            sys.modules["refunets.unet_1d"].timestep_embedding(
                torch.from_numpy(tsteps), kw["model_channels"]))
        mp_want = tmodel.box_messsage_passing(
            torch.from_numpy(uc_b), torch.from_numpy(triples),
            torch.from_numpy(box_t), t_emb=emb_t, enable_t_emb=True).numpy()
    _, inter = jmodel.apply(
        params, jnp.asarray(box_t),
        {"time_condition": jnp.asarray(tsteps),
         "other_condition": {"preds": jnp.asarray(triples.astype(np.int32)),
                             "uc_b": jnp.asarray(uc_b),
                             "edge_mask": jnp.ones((E,), bool)}},
        capture_intermediates=True, mutable=["intermediates"])
    mp_got = np.asarray(
        inter["intermediates"]["box_graph_cov"]["__call__"][0][0])
    np.testing.assert_allclose(mp_got, mp_want, rtol=1e-3, atol=1e-4)

    # Full composed numerical parity at production width (measured 7e-7).
    np.testing.assert_allclose(np.asarray(got), want.squeeze(),
                               rtol=1e-3, atol=1e-4)


def _load_ref_layout_stack():
    """Load reference layout_unet_v1 + layout_encoder (executed, never copied)."""
    pkg = sys.modules["refunets"]
    for name in ("nn", "util", "fp16_util", "layout_unet_v1"):
        if f"refunets.{name}" in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(
            f"refunets.{name}", REF / f"lidargen/models/unets/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refunets.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)

    # layout_encoder does `from ...utils.lidar import get_linear_ray_angles`:
    # give it a fake 3-level package with the real utils/lidar.py mounted.
    if "reflg.models.unets.layout_encoder" not in sys.modules:
        for name in ("reflg", "reflg.models", "reflg.models.unets", "reflg.utils"):
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules.setdefault(name, m)
        spec = importlib.util.spec_from_file_location(
            "reflg.utils.lidar", REF / "lidargen/utils/lidar.py"
        )
        lidar = importlib.util.module_from_spec(spec)
        sys.modules["reflg.utils.lidar"] = lidar
        spec.loader.exec_module(lidar)
        spec = importlib.util.spec_from_file_location(
            "reflg.models.unets.layout_encoder",
            REF / "lidargen/models/unets/layout_encoder.py",
        )
        le = importlib.util.module_from_spec(spec)
        sys.modules["reflg.models.unets.layout_encoder"] = le
        # the encoder __init__ calls .cuda() on the patch-bbox table
        # (layout_encoder.py:217); run it on CPU
        orig_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        try:
            spec.loader.exec_module(le)
        finally:
            torch.Tensor.cuda = orig_cuda
    return (sys.modules["refunets.layout_unet_v1"],
            sys.modules["reflg.models.unets.layout_encoder"],
            sys.modules["reflg.utils.lidar"])


def test_layout_stack_numerical_parity_with_reference():
    """Execute the reference LayoutTransformerEncoder + LayoutUnetV1
    (production topology from option_nusc_auto_reg_v2.py, narrowed W) and
    compare forwards through the converted weights — numerical ingestion
    parity for the flagship conditional 4D stack."""
    ref_lu, ref_le, ref_lidar = _load_ref_layout_stack()

    from lidarcrafter_tpu.models.layout_encoder import LayoutTransformerEncoder
    from lidarcrafter_tpu.models.layout_unet import LayoutUnetV1
    from lidarcrafter_tpu.utils.torch_ckpt import (
        convert_layout_encoder,
        convert_layout_unet,
    )

    H, W, B, L = 32, 256, 2, 13
    enc_kw = dict(
        feature_map_size=[H, W], used_condition_types=["obj_class", "obj_bbox",
                                                       "is_valid_obj"],
        layout_length=L, num_classes_for_layout_object=9,
        mask_size_for_layout_object=32, hidden_dim=64, output_dim=256,
        num_layers=6, num_heads=4, use_final_ln=True,
        use_positional_embedding=False, not_use_layout_fusion_module=False,
        resolution_to_attention=[4, 8], use_key_padding_mask=False,
        out_channels=11,
    )
    unet_kw = dict(
        in_channels=13, resolution=(H, W), image_size=H,
        use_scale_shift_norm=True, out_channels=2, model_channels=64,
        encoder_channels=64, num_head_channels=32, num_heads=-1,
        num_heads_upsample=-1, num_res_blocks=2, num_attention_blocks=1,
        resblock_updown=True, attention_ds=[4, 8], channel_mult=[1, 2, 4, 8],
        dropout=0.1, attention_block_type="ObjectAwareCrossAttention",
        use_positional_embedding_for_attention=True,
    )

    torch.manual_seed(0)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        tenc = ref_le.LayoutTransformerEncoder(**enc_kw).eval()
    finally:
        torch.Tensor.cuda = orig_cuda
    tunet = ref_lu.LayoutUnetV1(**unet_kw, use_fp16=False, use_checkpoint=False).eval()
    # production spherical projection replaces the polar-coords buffer with
    # linear ray angles (inference.py:160-166)
    tunet.coords = ref_lidar.get_linear_ray_angles(H=H, W=W, fov_up=10.0,
                                                   fov_down=-30.0)
    with torch.no_grad():
        for m in (tenc, tunet):
            for p in m.parameters():
                if p.abs().sum() == 0:
                    p.normal_(0, 0.02)

    r = np.random.RandomState(0)
    boxes9 = r.rand(B, L, 9).astype(np.float32)
    boxes9[..., -1] = r.randint(0, 9, (B, L))
    boxes2d = r.rand(B, L, 4).astype(np.float32)
    valid = (r.rand(B, L) > 0.3).astype(np.float32)
    concat = r.randn(B, 11, H, W).astype(np.float32)
    x = r.randn(B, 2, H, W).astype(np.float32)
    tsteps = r.randn(B).astype(np.float32)

    tcond = {
        "scaled_gt_boxes": torch.from_numpy(boxes9),
        "gt_boxes_2d": torch.from_numpy(boxes2d),
        "is_valid_obj": torch.from_numpy(valid),
        "concat_cond": torch.from_numpy(concat),
    }
    with torch.no_grad():
        tlayout = tenc(tcond)
        want = tunet(
            torch.from_numpy(x),
            {"time_condition": torch.from_numpy(tsteps),
             "other_condition": tlayout},
        ).numpy()

    jenc = LayoutTransformerEncoder(
        **{**enc_kw,
           "feature_map_size": tuple(enc_kw["feature_map_size"]),
           "used_condition_types": tuple(enc_kw["used_condition_types"]),
           "resolution_to_attention": tuple(enc_kw["resolution_to_attention"])})
    junet = LayoutUnetV1(
        **{k: (tuple(v) if isinstance(v, list) else v)
           for k, v in unet_kw.items()},
        use_ray_angle_coords=True,
    )
    ep = convert_layout_encoder({k: v.numpy() for k, v in tenc.state_dict().items()})
    up = convert_layout_unet(
        {k: v.numpy() for k, v in tunet.state_dict().items()},
        channel_mult=(1, 2, 4, 8), num_res_blocks=2, attention_ds=(4, 8),
    )

    jcond = {
        "scaled_gt_boxes": jnp.asarray(boxes9),
        "gt_boxes_2d": jnp.asarray(boxes2d),
        "is_valid_obj": jnp.asarray(valid),
        "concat_cond": jnp.asarray(concat.transpose(0, 2, 3, 1)),
    }
    jlayout = jenc.apply(ep, jcond)

    # encoder-output parity: xf_proj / xf_out / positional + patch embeddings
    np.testing.assert_allclose(
        np.asarray(jlayout["xf_proj"]), tlayout["xf_proj"].numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jlayout["xf_out"]).transpose(0, 2, 1),
        tlayout["xf_out"].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jlayout["obj_bbox_embedding"]).transpose(0, 2, 1),
        tlayout["obj_bbox_embedding"].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jlayout["obj_class_embedding"]).transpose(0, 2, 1),
        tlayout["obj_class_embedding"].numpy(), rtol=1e-4, atol=1e-5)
    for ds in (4, 8):
        key = f"image_patch_bbox_embedding_for_resolution{H // ds}"
        np.testing.assert_allclose(
            np.asarray(jlayout[key]).transpose(0, 2, 1),
            tlayout[key].numpy(), rtol=1e-4, atol=1e-5)

    got = junet.apply(
        up, jnp.asarray(x.transpose(0, 2, 3, 1)),
        {"time_condition": jnp.asarray(tsteps), "other_condition": jlayout},
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def _load_ref_layout_unet_v0():
    """Load the reference v0 ``layout_unet`` module (executed, never copied)."""
    pkg = sys.modules["refunets"]
    for name in ("nn", "util", "fp16_util", "layout_unet"):
        if f"refunets.{name}" in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(
            f"refunets.{name}", REF / f"lidargen/models/unets/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refunets.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return sys.modules["refunets.layout_unet"]


def test_layout_unet_v0_numerical_parity_with_reference():
    """Execute the reference v0 LayoutUnet (``layout_unet.py:600``; plain
    convs, ADM h_upd/x_upd resampling, functional timestep embedding) at the
    ``option_nusc_box_layout.py`` topology (narrowed W) and compare forwards
    through the converted weights — so ``nuscenes-box-layout`` checkpoints
    ingest faithfully."""
    ref_lu0 = _load_ref_layout_unet_v0()
    _, ref_le, _ = _load_ref_layout_stack()

    from lidarcrafter_tpu.models.layout_encoder import LayoutTransformerEncoder
    from lidarcrafter_tpu.models.layout_unet import LayoutUnet
    from lidarcrafter_tpu.utils.torch_ckpt import (
        convert_layout_encoder,
        convert_layout_unet,
    )

    H, W, B, L = 32, 256, 2, 13
    # option_nusc_box_layout.py:31-51, hidden/output narrowed 4x
    enc_kw = dict(
        feature_map_size=[H, W],
        used_condition_types=["obj_class", "obj_bbox", "is_valid_obj"],
        layout_length=L, num_classes_for_layout_object=9,
        mask_size_for_layout_object=32, hidden_dim=64, output_dim=256,
        num_layers=3, num_heads=4, use_final_ln=True,
        use_positional_embedding=False, not_use_layout_fusion_module=False,
        resolution_to_attention=[4], use_key_padding_mask=False,
    )
    # option_nusc_box_layout.py:9-28, model_channels narrowed 4x
    unet_kw = dict(
        in_channels=2, image_size=H, use_scale_shift_norm=True,
        out_channels=2, model_channels=64, encoder_channels=64,
        num_head_channels=32, num_heads=-1, num_heads_upsample=-1,
        num_res_blocks=2, num_attention_blocks=1, resblock_updown=True,
        attention_ds=[4], channel_mult=[1, 1, 2], dropout=0.1,
        attention_block_type="ObjectAwareCrossAttention",
        use_positional_embedding_for_attention=True,
    )

    torch.manual_seed(0)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        tenc = ref_le.LayoutTransformerEncoder(**enc_kw).eval()
        tunet = ref_lu0.LayoutUnet(
            **unet_kw, use_fp16=False, use_checkpoint=False
        ).eval()
    finally:
        torch.Tensor.cuda = orig_cuda
    with torch.no_grad():
        for m in (tenc, tunet):
            for p in m.parameters():
                if p.abs().sum() == 0:
                    p.normal_(0, 0.02)

    r = np.random.RandomState(1)
    boxes9 = r.rand(B, L, 9).astype(np.float32)
    boxes9[..., -1] = r.randint(0, 9, (B, L))
    boxes2d = r.rand(B, L, 4).astype(np.float32)
    valid = (r.rand(B, L) > 0.3).astype(np.float32)
    x = r.randn(B, 2, H, W).astype(np.float32)
    tsteps = r.randn(B).astype(np.float32)

    tcond = {
        "scaled_gt_boxes": torch.from_numpy(boxes9),
        "gt_boxes_2d": torch.from_numpy(boxes2d),
        "is_valid_obj": torch.from_numpy(valid),
    }
    with torch.no_grad():
        tlayout = tenc(tcond)
        want = tunet(
            torch.from_numpy(x),
            {"time_condition": torch.from_numpy(tsteps),
             "other_condition": tlayout},
        ).numpy()

    jenc = LayoutTransformerEncoder(
        **{**enc_kw,
           "feature_map_size": tuple(enc_kw["feature_map_size"]),
           "used_condition_types": tuple(enc_kw["used_condition_types"]),
           "resolution_to_attention": tuple(enc_kw["resolution_to_attention"])})
    junet = LayoutUnet(
        **{k: (tuple(v) if isinstance(v, list) else v)
           for k, v in unet_kw.items()},
        resolution=(H, W),
    )
    ep = convert_layout_encoder({k: v.numpy() for k, v in tenc.state_dict().items()})
    up = convert_layout_unet(
        {k: v.numpy() for k, v in tunet.state_dict().items()},
        channel_mult=(1, 1, 2), num_res_blocks=2, attention_ds=(4,),
    )

    jcond = {
        "scaled_gt_boxes": jnp.asarray(boxes9),
        "gt_boxes_2d": jnp.asarray(boxes2d),
        "is_valid_obj": jnp.asarray(valid),
    }
    jlayout = jenc.apply(ep, jcond)
    np.testing.assert_allclose(
        np.asarray(jlayout["xf_proj"]), tlayout["xf_proj"].numpy(),
        rtol=1e-4, atol=1e-5)

    got = junet.apply(
        up, jnp.asarray(x.transpose(0, 2, 3, 1)),
        {"time_condition": jnp.asarray(tsteps), "other_condition": jlayout},
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def _load_ref_module_pkg(pkg_name, base_dir, names):
    """Load reference modules as a package so relative imports resolve."""
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [str(base_dir)]
        sys.modules[pkg_name] = pkg
    for name in names:
        full = f"{pkg_name}.{name}"
        if full in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(full, base_dir / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        setattr(sys.modules[pkg_name], name, mod)
    return sys.modules


def test_point_unet_numerical_parity_with_reference():
    """Executed reference PointUNet (point_unet.py:28-72) vs converted."""
    from lidarcrafter_tpu.models.point_unet import PointUNet
    from lidarcrafter_tpu.utils.torch_ckpt import convert_point_unet

    mods = _load_ref_module_pkg(
        "refpu", REF / "lidargen/models/unets", ["point_unet"]
    )
    torch.manual_seed(3)
    t = mods["refpu.point_unet"].PointUNet(point_dim=4, cond_dims=768).eval()

    r = np.random.RandomState(3)
    coords = r.randn(2, 64, 4).astype(np.float32)
    beta = r.rand(2).astype(np.float32)
    cond = r.randn(2, 768).astype(np.float32)
    with torch.no_grad():
        want = t(
            torch.from_numpy(coords),
            {"time_condition": torch.from_numpy(beta),
             "other_condition": torch.from_numpy(cond)},
        ).numpy()

    m = PointUNet(point_dim=4, cond_dims=768)
    params = convert_point_unet({k: v.numpy() for k, v in t.state_dict().items()})
    got = np.asarray(m.apply(
        params, jnp.asarray(coords),
        {"time_condition": jnp.asarray(beta), "other_condition": jnp.asarray(cond)},
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_object_gen_encoder_numerical_parity_with_reference():
    """Executed reference ObjectGenEncoder (encoders/object_gen_encoder.py:8-66)
    vs converted (text-feature table injected, not unpickled)."""
    from lidarcrafter_tpu.models.point_unet import ObjectGenEncoder
    from lidarcrafter_tpu.utils.torch_ckpt import convert_object_gen_encoder

    mods = _load_ref_module_pkg(
        "refenc", REF / "lidargen/models/unets/encoders",
        ["embedder", "object_gen_encoder"],
    )
    classes = ["car", "truck", "construction_vehicle", "bus", "trailer",
               "motorcycle", "bicycle", "pedestrian"]
    torch.manual_seed(4)
    t = mods["refenc.object_gen_encoder"].ObjectGenEncoder(
        num_class=8, input_dim=6, object_classes=classes
    ).eval()
    r = np.random.RandomState(4)
    text_feat = r.randn(8, 512).astype(np.float32)
    t.obj_text_feat = {c: torch.from_numpy(text_feat[i]) for i, c in enumerate(classes)}
    t.prepare_called = True

    boxes = r.randn(5, 6).astype(np.float32)
    cls = r.randint(0, 8, (5,))
    with torch.no_grad():
        want = t({"fg_encoding_box": torch.from_numpy(boxes),
                  "fg_class": torch.from_numpy(cls)}).numpy()

    m = ObjectGenEncoder()
    params = convert_object_gen_encoder(
        {k: v.numpy() for k, v in t.state_dict().items()}
    )
    got = np.asarray(m.apply(params, {
        "fg_encoding_box": jnp.asarray(boxes),
        "fg_class": jnp.asarray(cls.astype(np.int32)),
        "fg_text_features": jnp.asarray(text_feat),
    }))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_scene_graph_numerical_parity_with_reference():
    """Executed reference SceneGraph GCN (scene_graph.py:6-148, no-edit path)
    vs converted — encoder + manipulation nets both exercised."""
    from lidarcrafter_tpu.models.scene_graph import SceneGraph
    from lidarcrafter_tpu.utils.torch_ckpt import convert_scene_graph

    mods = _load_ref_module_pkg(
        "refsg", REF / "lidargen/models/unets", ["graph", "scene_graph"]
    )
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        vocab = {
            "object_idx_to_name": [f"o{i}" for i in range(9)],
            "pred_idx_to_name": [f"p{i}" for i in range(16)],
        }
        torch.manual_seed(5)
        t = mods["refsg.scene_graph"].SceneGraph(
            vocab, embedding_dim=64, gconv_num_layers=5,
            mlp_normalization="none", use_clip=True,
        ).eval()

        r = np.random.RandomState(5)
        N, E = 7, 10
        objs = r.randint(0, 9, (N,))
        triples = np.stack(
            [r.randint(0, N, (E,)), r.randint(0, 16, (E,)), r.randint(0, N, (E,))],
            axis=1,
        )
        text = r.randn(N, 512).astype(np.float32)
        rel = r.randn(E, 512).astype(np.float32)
        with torch.no_grad():
            want_latent, want_obj_embed = t(
                torch.from_numpy(objs), torch.from_numpy(triples),
                torch.from_numpy(text), torch.from_numpy(rel),
                torch.from_numpy(objs), torch.from_numpy(triples), None,
                torch.from_numpy(text), torch.from_numpy(rel),
                None, None, [], [],
            )
    finally:
        torch.Tensor.cuda = orig_cuda

    m = SceneGraph(num_objs=9, num_preds=16, embedding_dim=64)
    params = convert_scene_graph({k: v.numpy() for k, v in t.state_dict().items()})
    latent, obj_embed = m.apply(
        params, jnp.asarray(objs.astype(np.int32)),
        jnp.asarray(triples.astype(np.int32)), jnp.asarray(text), jnp.asarray(rel),
        edge_mask=jnp.ones((E,), bool),
    )
    np.testing.assert_allclose(
        np.asarray(latent), want_latent.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(obj_embed), want_obj_embed.numpy(), rtol=1e-4, atol=1e-5)


class _TimmRMSReadyAttention(torch.nn.Module):
    """timm ``vision_transformer.Attention`` reconstruction (qkv_bias +
    qk_norm path, unfused) — timm itself is not installed; the reference
    imports it at ``efficient_mf_unet.py:8``.  Key names (qkv / q_norm /
    k_norm / proj) match released checkpoints."""

    def __init__(self, dim, num_heads=8, qkv_bias=False, qk_norm=False,
                 norm_layer=torch.nn.LayerNorm, **kw):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = torch.nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.q_norm = norm_layer(self.head_dim) if qk_norm else torch.nn.Identity()
        self.k_norm = norm_layer(self.head_dim) if qk_norm else torch.nn.Identity()
        self.proj = torch.nn.Linear(dim, dim)
        self.fused_attn = False

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        q, k = self.q_norm(q), self.k_norm(k)
        q = q * self.scale
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


def _load_ref_mf_unet():
    pkg = sys.modules["refunets"]
    if "refunets.efficient_mf_unet" in sys.modules:
        return sys.modules["refunets.efficient_mf_unet"]
    timm = types.ModuleType("timm")
    models_m = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.Attention = _TimmRMSReadyAttention
    models_m.vision_transformer = vt
    timm.models = models_m
    for n, m in (("timm", timm), ("timm.models", models_m),
                 ("timm.models.vision_transformer", vt)):
        sys.modules.setdefault(n, m)
    spec = importlib.util.spec_from_file_location(
        "refunets.efficient_mf_unet",
        REF / "lidargen/models/unets/efficient_mf_unet.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refunets.efficient_mf_unet"] = mod
    spec.loader.exec_module(mod)
    setattr(pkg, "efficient_mf_unet", mod)
    return mod


def test_mf_efficient_unet_numerical_parity_with_reference():
    """Executed reference MFEfficientUNet (dual time embeddings + timm
    qk-norm attention, ``efficient_mf_unet.py:193-315``) vs converted —
    MeanFlow checkpoints ingest faithfully."""
    from lidarcrafter_tpu.models.efficient_unet import MFEfficientUNet

    ref_mf = _load_ref_mf_unet()
    torch.manual_seed(7)
    tmodel = ref_mf.MFEfficientUNet(**KW).eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)

    r = np.random.RandomState(7)
    x = r.randn(2, 2, H, W).astype(np.float32)
    t = r.rand(2).astype(np.float32)
    s = r.rand(2).astype(np.float32)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(s)
        ).numpy()

    jmodel = MFEfficientUNet(**KW)
    params = convert_efficient_unet(
        {k: v.numpy() for k, v in tmodel.state_dict().items()},
        attn_num_heads=KW["attn_num_heads"], mf=True,
    )
    got = np.asarray(jmodel.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t), jnp.asarray(s),
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)
