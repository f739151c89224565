"""PyTorch checkpoint ingestion: reference state_dicts → flax param pytrees.

The reference hosts pretrained ``.pth`` checkpoints whose dicts embed the
config and both online/EMA weights (``train_lidm.py:249-259``); loaders pick
``weights`` vs ``ema_weights`` (``inference.py:75``).  This module maps those
state_dicts onto our flax trees so existing checkpoints drive the TPU backend
unchanged (BASELINE.json requirement).

Conversions: Conv2d (O,I,Kh,Kw) → (Kh,Kw,I,O); Linear (O,I) → (I,O); packed
torch ``MultiheadAttention`` in_proj → per-head flax query/key/value kernels.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _conv(w):  # torch OIHW → flax HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _linear(w):  # torch (O, I) → flax (I, O)
    return np.transpose(np.asarray(w), (1, 0))


def _mha(in_proj_w, in_proj_b, out_w, out_b, num_heads):
    """torch packed MHA → flax MultiHeadDotProductAttention params."""
    C = in_proj_w.shape[1]
    dh = C // num_heads
    qw, kw, vw = (np.asarray(in_proj_w[i * C : (i + 1) * C]) for i in range(3))
    qb, kb, vb = (np.asarray(in_proj_b[i * C : (i + 1) * C]) for i in range(3))

    def head_kernel(w):  # (C_out, C_in) → (C_in, heads, dh)
        return _linear(w).reshape(C, num_heads, dh)

    def head_bias(b):
        return b.reshape(num_heads, dh)

    return {
        "query": {"kernel": head_kernel(qw), "bias": head_bias(qb)},
        "key": {"kernel": head_kernel(kw), "bias": head_bias(kb)},
        "value": {"kernel": head_kernel(vw), "bias": head_bias(vb)},
        "out": {
            "kernel": np.asarray(out_w).T.reshape(num_heads, dh, C),
            "bias": np.asarray(out_b),
        },
    }


def strip_prefix(state_dict: Mapping, prefix: str) -> dict:
    return {
        k[len(prefix) :]: v for k, v in state_dict.items() if k.startswith(prefix)
    }


def convert_efficient_unet(
    state_dict: Mapping[str, "np.ndarray"], attn_num_heads: int = 8,
    mf: bool = False,
) -> dict:
    """Reference ``EfficientUNet`` state_dict → flax params for
    :class:`lidarcrafter_tpu.models.efficient_unet.EfficientUNet`.

    Accepts the raw module state_dict (tensors or numpy); strip engine
    prefixes (e.g. ``model.``) with :func:`strip_prefix` first.

    ``mf=True`` handles the MeanFlow variant (``efficient_mf_unet.py``):
    dual ``start/end_time_embedding`` MLPs and timm qk-norm attention
    (``attn.qkv`` / ``q_norm.g`` / ``k_norm.g`` / ``attn.proj``) instead of
    the packed ``nn.MultiheadAttention``.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: dict = {}

    def put(path: str, leaf):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(leaf, np.float32)

    # time embedding (Sequential indices 1 and 3)
    temb_names = (
        ("start_time_embedding", "end_time_embedding") if mf else ("time_embedding",)
    )
    for tname in temb_names:
        for ref_i, ours in (("1", "Dense_0"), ("3", "Dense_1")):
            put(f"{tname}/{ours}/kernel", _linear(sd[f"{tname}.{ref_i}.weight"]))
            put(f"{tname}/{ours}/bias", sd[f"{tname}.{ref_i}.bias"])

    put("in_conv/Conv_0/kernel", _conv(sd["in_conv.weight"]))
    put("in_conv/Conv_0/bias", sd["in_conv.bias"])
    put("out_conv/Conv_0/kernel", _conv(sd["out_conv.weight"]))
    put("out_conv/Conv_0/bias", sd["out_conv.bias"])

    blocks = sorted(
        {m.group(1) for k in sd for m in [re.match(r"([du]_block\d)\.", k)] if m}
    )
    for blk in blocks:
        b = strip_prefix(sd, blk + ".")
        if f"downsample.0.weight" in b:
            put(f"{blk}/down_conv/Conv_0/kernel", _conv(b["downsample.0.weight"]))
            put(f"{blk}/down_conv/Conv_0/bias", b["downsample.0.bias"])
        if f"upsample.1.weight" in b:
            put(f"{blk}/up_conv/Conv_0/kernel", _conv(b["upsample.1.weight"]))
            put(f"{blk}/up_conv/Conv_0/bias", b["upsample.1.bias"])
        res_ids = sorted(
            {m.group(1) for k in b for m in [re.match(r"residual_blocks\.(\d+)\.", k)] if m}
        )
        for j in res_ids:
            r = strip_prefix(b, f"residual_blocks.{j}.")
            base = f"{blk}/res{j}"
            put(f"{base}/GroupNorm_0/scale", r["norm1.weight"])
            put(f"{base}/GroupNorm_0/bias", r["norm1.bias"])
            put(f"{base}/conv1/Conv_0/kernel", _conv(r["conv1.weight"]))
            put(f"{base}/conv1/Conv_0/bias", r["conv1.bias"])
            put(f"{base}/norm2/Dense_0/kernel", _linear(r["norm2.proj.1.weight"]))
            put(f"{base}/norm2/Dense_0/bias", r["norm2.proj.1.bias"])
            put(f"{base}/conv2/Conv_0/kernel", _conv(r["conv2.weight"]))
            put(f"{base}/conv2/Conv_0/bias", r["conv2.bias"])
            if "skip.weight" in r:
                put(f"{base}/skip/Conv_0/kernel", _conv(r["skip.weight"]))
                put(f"{base}/skip/Conv_0/bias", r["skip.bias"])
        if "self_attn_block.norm.weight" in b:
            a = strip_prefix(b, "self_attn_block.")
            put(f"{blk}/attn/GroupNorm_0/scale", a["norm.weight"])
            put(f"{blk}/attn/GroupNorm_0/bias", a["norm.bias"])
            if mf:
                put(f"{blk}/attn/qkv/kernel", _linear(a["attn.qkv.weight"]))
                put(f"{blk}/attn/qkv/bias", a["attn.qkv.bias"])
                put(f"{blk}/attn/q_norm_g", a["attn.q_norm.g"])
                put(f"{blk}/attn/k_norm_g", a["attn.k_norm.g"])
                put(f"{blk}/attn/proj/kernel", _linear(a["attn.proj.weight"]))
                put(f"{blk}/attn/proj/bias", a["attn.proj.bias"])
            else:
                mha = _mha(
                    a["attn.in_proj_weight"], a["attn.in_proj_bias"],
                    a["attn.out_proj.weight"], a["attn.out_proj.bias"],
                    attn_num_heads,
                )
                base = f"{blk}/attn/MultiHeadDotProductAttention_0"
                for mod, leaves in mha.items():
                    for leaf, val in leaves.items():
                        put(f"{base}/{mod}/{leaf}", val)
    return {"params": out}


def load_torch_checkpoint(path: str, use_ema: bool = True) -> tuple[dict, dict]:
    """Load a reference ``.pth`` → (state_dict, cfg dict); cf.
    ``inference.py:36-38,75``."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    key = "ema_weights" if (use_ema and "ema_weights" in ckpt) else "weights"
    sd = {k: v.numpy() for k, v in ckpt[key].items()}
    return sd, ckpt.get("cfg", {})


def ingest_efficient_unet_checkpoint(path: str, use_ema: bool = True):
    """One-call ingestion for the flagship model: returns (flax_params, cfg).

    The reference wraps the denoiser in the diffusion engine; its state_dict
    keys carry a ``model.`` prefix (EMA adds ``ema_model.``) — both handled.
    """
    sd, cfg = load_torch_checkpoint(path, use_ema)
    for prefix in ("ema_model.model.", "model.", ""):
        sub = strip_prefix(sd, prefix) if prefix else sd
        if any(k.startswith("in_conv.") for k in sub):
            heads = (
                cfg.get("model", {}).get("params", {}).get("attn_num_heads", 8)
                if isinstance(cfg, dict)
                else 8
            )
            return convert_efficient_unet(sub, attn_num_heads=heads), cfg
    raise ValueError("could not locate EfficientUNet weights in checkpoint")


# --------------------------------------------------------------- layout family


def _gn(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _lin(sd, prefix):
    return {"kernel": _linear(np.asarray(sd[f"{prefix}.weight"])),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _conv1d_as_dense(sd, prefix):
    """torch 1D conv (O, I, 1) → flax Dense (I, O)."""
    w = np.asarray(sd[f"{prefix}.weight"])[..., 0]
    return {"kernel": w.T, "bias": np.asarray(sd[f"{prefix}.bias"])}


def _conv3(sd, prefix):
    return {"Conv_0": {"kernel": _conv(np.asarray(sd[f"{prefix}.weight"])),
                       "bias": np.asarray(sd[f"{prefix}.bias"])}}


def _adm_resblock(sd, prefix):
    """ADM ResBlock (``layout_unet_v1.py:143-249``) → ResBlockADM params."""
    out = {
        "in_norm": _gn(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv3(sd, f"{prefix}.in_layers.2"),
        "emb_proj": _lin(sd, f"{prefix}.emb_layers.1"),
        "out_norm": _gn(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv3(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        out["skip"] = _conv3(sd, f"{prefix}.skip_connection")
    return out


def _object_aware_attn(sd, prefix):
    """ObjectAwareCrossAttention (``layout_unet_v1.py:347-553``); all 1D convs
    become Dense (token-last layout)."""
    out = {
        "norm_for_qkv": _gn(sd, f"{prefix}.norm_for_qkv"),
        "qkv_projector": _conv1d_as_dense(sd, f"{prefix}.qkv_projector"),
        "layout_content_embedding_projector": _conv1d_as_dense(
            sd, f"{prefix}.layout_content_embedding_projector"),
        "layout_position_embedding_projector": _conv1d_as_dense(
            sd, f"{prefix}.layout_position_embedding_projector"),
        "norm_for_obj_class_embedding": _gn(
            sd, f"{prefix}.norm_for_obj_class_embedding"),
        "norm_for_layout_positional_embedding": _gn(
            sd, f"{prefix}.norm_for_layout_positional_embedding"),
        "norm_for_image_patch_positional_embedding": _gn(
            sd, f"{prefix}.norm_for_image_patch_positional_embedding"),
        "proj_out": _conv1d_as_dense(sd, f"{prefix}.proj_out"),
    }
    if f"{prefix}.norm_for_obj_embedding.weight" in sd:
        out["norm_for_obj_embedding"] = _gn(sd, f"{prefix}.norm_for_obj_embedding")
    return out


def convert_layout_unet(
    sd: Mapping,
    channel_mult=(1, 2, 4, 8),
    num_res_blocks: int = 2,
    attention_ds=(4, 8),
    num_attention_blocks: int = 1,
) -> dict:
    """torch ``LayoutUnetV1`` state_dict → flax params for
    :class:`~lidarcrafter_tpu.models.layout_unet.LayoutUnetV1`.

    Replays the reference's block-list construction
    (``layout_unet_v1.py:691-863``: input_blocks / middle_block /
    output_blocks with resblock up/downsampling) to map list indices onto our
    named modules (``in_{level}_{i}_res`` …).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    # LayoutUnetV1's time_embed Sequential leads with a (parameterless)
    # SinusoidalPositionalEmbedding (layout_unet_v1.py:683-688), so the two
    # Linears sit at indices 1 and 3 in real checkpoints.
    t0, t1 = ("time_embed.1", "time_embed.3") if "time_embed.1.weight" in sd \
        else ("time_embed.0", "time_embed.2")
    params = {
        "time_embed": {"Dense_0": _lin(sd, t0),
                       "Dense_1": _lin(sd, t1)},
        "in_conv": _conv3(sd, "input_blocks.0.0"),
        "out_norm": _gn(sd, "out.0"),
        "out_conv": _conv3(sd, "out.2"),
    }
    ds, idx = 1, 1
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            params[f"in_{level}_{i}_res"] = _adm_resblock(sd, f"input_blocks.{idx}.0")
            if ds in attention_ds:
                for a in range(num_attention_blocks):
                    params[f"in_{level}_{i}_attn{a}"] = _object_aware_attn(
                        sd, f"input_blocks.{idx}.{1 + a}")
            idx += 1
        if level != len(channel_mult) - 1:
            params[f"down_{level}"] = _adm_resblock(sd, f"input_blocks.{idx}.0")
            idx += 1
            ds *= 2

    params["mid_res1"] = _adm_resblock(sd, "middle_block.0")
    params["mid_attn"] = _object_aware_attn(sd, "middle_block.1")
    params["mid_res2"] = _adm_resblock(sd, "middle_block.2")

    idx = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            params[f"out_{level}_{i}_res"] = _adm_resblock(sd, f"output_blocks.{idx}.0")
            off = 1
            if ds in attention_ds:
                for a in range(num_attention_blocks):
                    params[f"out_{level}_{i}_attn{a}"] = _object_aware_attn(
                        sd, f"output_blocks.{idx}.{off + a}")
                off += num_attention_blocks
            if level and i == num_res_blocks:
                params[f"up_{level}"] = _adm_resblock(sd, f"output_blocks.{idx}.{off}")
                ds //= 2
            idx += 1
    return {"params": params}


def convert_layout_encoder(sd: Mapping) -> dict:
    """torch ``LayoutTransformerEncoder`` state_dict → flax params
    (``layout_encoder.py:140-310``: GLIDE transformer + box embeddings)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "transformer_proj": _lin(sd, "transformer_proj"),
        "obj_class_embedding": {
            "embedding": np.asarray(sd["obj_class_embedding.weight"])},
        "obj_bbox_embedding": _lin(sd, "obj_bbox_embedding"),
        "obj_bbox_2d_embedding": _lin(sd, "obj_bbox_2d_embedding"),
    }
    if "final_ln.weight" in sd:
        params["final_ln"] = {"scale": sd["final_ln.weight"],
                              "bias": sd["final_ln.bias"]}
    if "positional_embedding" in sd:
        params["positional_embedding"] = sd["positional_embedding"]
    n = 0
    while f"transform.resblocks.{n}.attn.c_qkv.weight" in sd:
        p = f"transform.resblocks.{n}"
        params[f"resblock{n}"] = {
            "attn": {"c_qkv": _lin(sd, f"{p}.attn.c_qkv"),
                     "c_proj": _lin(sd, f"{p}.attn.c_proj")},
            "ln_1": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]},
            "ln_2": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]},
            "mlp_fc": _lin(sd, f"{p}.mlp.c_fc"),
            "mlp_proj": _lin(sd, f"{p}.mlp.c_proj"),
        }
        n += 1
    return {"params": params}


# ------------------------------------------------------------- unet_1d family


def _conv1d_mid_tap(sd, prefix):
    """torch 1D conv (O, I, k) → Dense (I, O), middle tap only.

    Our :class:`~lidarcrafter_tpu.models.unet_1d.UNet1DModel` runs length-1
    sequences in dense form: a k=3 SAME conv on L=1 multiplies taps 0 and 2
    by zero padding, so only the middle tap carries weight."""
    w = np.asarray(sd[f"{prefix}.weight"])
    out = {"kernel": w[..., w.shape[-1] // 2].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _res1d(sd, prefix):
    out = {
        "in_norm": _gn(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv1d_mid_tap(sd, f"{prefix}.in_layers.2"),
        "emb_proj": _lin(sd, f"{prefix}.emb_layers.1"),
        "out_norm": _gn(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv1d_mid_tap(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        out["skip"] = _conv1d_mid_tap(sd, f"{prefix}.skip_connection")
    return out


def _spatial_transformer_1d(sd, prefix, depth=1):
    """LDM SpatialTransformer1D (``attention.py:353-…``): norm + 1x1 in/out
    projections + BasicTransformerBlocks (self-attn, cross-attn, GEGLU FF)."""
    out = {
        "norm": _gn(sd, f"{prefix}.norm"),
        "proj_in": _conv1d_mid_tap(sd, f"{prefix}.proj_in"),
        "proj_out": _conv1d_mid_tap(sd, f"{prefix}.proj_out"),
    }
    for d in range(depth):
        b = f"{prefix}.transformer_blocks.{d}"

        def attn(a):
            return {
                "to_q": {"kernel": _linear(np.asarray(sd[f"{b}.{a}.to_q.weight"]))},
                "to_k": {"kernel": _linear(np.asarray(sd[f"{b}.{a}.to_k.weight"]))},
                "to_v": {"kernel": _linear(np.asarray(sd[f"{b}.{a}.to_v.weight"]))},
                "to_out": _lin(sd, f"{b}.{a}.to_out.0"),
            }

        out[f"block{d}"] = {
            "attn1": attn("attn1"),
            "attn2": attn("attn2"),
            "ff": {"geglu": _lin(sd, f"{b}.ff.net.0.proj"),
                   "proj_out": _lin(sd, f"{b}.ff.net.2")},
            "norm1": {"scale": np.asarray(sd[f"{b}.norm1.weight"]),
                      "bias": np.asarray(sd[f"{b}.norm1.bias"])},
            "norm2": {"scale": np.asarray(sd[f"{b}.norm2.weight"]),
                      "bias": np.asarray(sd[f"{b}.norm2.bias"])},
            "norm3": {"scale": np.asarray(sd[f"{b}.norm3.weight"]),
                      "bias": np.asarray(sd[f"{b}.norm3.bias"])},
        }
    return out


def _gconv(sd, prefix):
    """GraphTripleConv (``graph.py:89-211``); build_mlp with batch norm puts
    Linear/BN at sequence indices 0/1 and 3/4.  Returns (params, batch_stats)
    — our MaskedBatchNorm keeps running mean/var in the ``batch_stats``
    collection."""

    def bn_p(p):
        return {"scale": np.asarray(sd[f"{p}.weight"]),
                "bias": np.asarray(sd[f"{p}.bias"])}

    def bn_s(p):
        return {"mean": np.asarray(sd[f"{p}.running_mean"]),
                "var": np.asarray(sd[f"{p}.running_var"])}

    def net_p(p):
        return {"lin0": _lin(sd, f"{p}.0"), "bn0": bn_p(f"{p}.1"),
                "lin1": _lin(sd, f"{p}.3"), "bn1": bn_p(f"{p}.4")}

    def net_s(p):
        return {"bn0": bn_s(f"{p}.1"), "bn1": bn_s(f"{p}.4")}

    params = {"net1": net_p(f"{prefix}.net1"), "net2": net_p(f"{prefix}.net2")}
    stats = {"net1": net_s(f"{prefix}.net1"), "net2": net_s(f"{prefix}.net2")}
    if f"{prefix}.linear_projection.weight" in sd:
        params["linear_projection"] = _lin(sd, f"{prefix}.linear_projection")
        params["linear_projection_pred"] = _lin(
            sd, f"{prefix}.linear_projection_pred")
    return params, stats


def convert_unet_1d(
    sd: Mapping,
    channel_mult=(1, 1, 1, 1),
    num_res_blocks: int = 2,
    attention_resolutions=(4, 2),
    transformer_depth: int = 1,
    gcn_layers: int = 5,
) -> dict:
    """torch ``UNet1DModel`` state_dict → flax params
    (``unet_1d.py:368-716``: 1D ADM trunk + SpatialTransformer1D cross-attn
    + box GCN message passing)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "time_embed0": _lin(sd, "time_embed.0"),
        "time_embed1": _lin(sd, "time_embed.2"),
        "in_conv": _conv1d_mid_tap(sd, "input_blocks.0.0"),
        "out_norm": _gn(sd, "out.0"),
        "out_conv": _conv1d_mid_tap(sd, "out.2"),
        "pred_embeddings": {"embedding": sd["pred_embeddings.weight"]},
        "box_embeddings": _lin(sd, "box_embeddings"),
    }
    if "box_time_emb.weight" in sd:
        params["box_time_emb"] = _lin(sd, "box_time_emb")
    gcn = [(f"gconv{i}", _gconv(sd, f"box_graph_cov.gconvs.{i}"))
           for i in range(gcn_layers)]
    params["box_graph_cov"] = {k: p for k, (p, _) in gcn}
    batch_stats = {"box_graph_cov": {k: s for k, (_, s) in gcn}}

    ds, idx = 1, 1
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            params[f"in_{level}_{i}_res"] = _res1d(sd, f"input_blocks.{idx}.0")
            if ds in attention_resolutions:
                params[f"in_{level}_{i}_attn"] = _spatial_transformer_1d(
                    sd, f"input_blocks.{idx}.1", transformer_depth)
            idx += 1
        if level != len(channel_mult) - 1:
            params[f"down_{level}"] = _conv1d_mid_tap(
                sd, f"input_blocks.{idx}.0.op")
            idx += 1
            ds *= 2

    params["mid_res1"] = _res1d(sd, "middle_block.0")
    params["mid_attn"] = _spatial_transformer_1d(sd, "middle_block.1",
                                                 transformer_depth)
    params["mid_res2"] = _res1d(sd, "middle_block.2")

    idx = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            params[f"out_{level}_{i}_res"] = _res1d(sd, f"output_blocks.{idx}.0")
            off = 1
            if ds in attention_resolutions:
                params[f"out_{level}_{i}_attn"] = _spatial_transformer_1d(
                    sd, f"output_blocks.{idx}.{off}", transformer_depth)
                off += 1
            if level and i == num_res_blocks:
                params[f"up_{level}"] = _conv1d_mid_tap(
                    sd, f"output_blocks.{idx}.{off}.conv")
                ds //= 2
            idx += 1
    return {"params": params, "batch_stats": batch_stats}


# ----------------------------------------------- point / scene-graph families


def convert_point_unet(sd: Mapping, num_layers: int = 6) -> dict:
    """torch ``PointUNet`` state_dict → flax params
    (``point_unet.py:14-71``: 6 gated PCNet layers)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {}
    for i in range(num_layers):
        p = f"layers.{i}"
        params[f"layer{i}"] = {
            "fea_layer": _lin(sd, f"{p}.fea_layer"),
            "cond_bias": {"kernel": _linear(sd[f"{p}.cond_bias.weight"])},
            "cond_gate": _lin(sd, f"{p}.cond_gate"),
        }
    return {"params": params}


def convert_object_gen_encoder(sd: Mapping) -> dict:
    """torch ``ObjectGenEncoder`` state_dict → flax params
    (``encoders/object_gen_encoder.py:8-35``: Fourier box proj + 3-layer MLP
    over [box_emb, class_text_feature])."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return {"params": {
        "bbox_proj": _lin(sd, "bbox_proj"),
        "second0": _lin(sd, "second_linear.0"),
        "second1": _lin(sd, "second_linear.2"),
        "second2": _lin(sd, "second_linear.4"),
    }}


def _gconv_auto(sd, prefix):
    """GraphTripleConv with either mlp_normalization='batch' (Linear/BN at
    0/1 and 3/4) or 'none' (Linear at 0 and 2)."""
    if f"{prefix}.net1.1.running_mean" in sd:
        return _gconv(sd, prefix)

    def net(p):
        return {"lin0": _lin(sd, f"{p}.0"), "lin1": _lin(sd, f"{p}.2")}

    params = {"net1": net(f"{prefix}.net1"), "net2": net(f"{prefix}.net2")}
    if f"{prefix}.linear_projection.weight" in sd:
        params["linear_projection"] = _lin(sd, f"{prefix}.linear_projection")
        params["linear_projection_pred"] = _lin(
            sd, f"{prefix}.linear_projection_pred")
    return params, None


def convert_scene_graph(sd: Mapping) -> dict:
    """torch ``SceneGraph`` state_dict → flax params (``scene_graph.py:6-90``).

    ``obj_embeddings_dc`` exists in the reference but is never used in its
    forward (flagged TODO there) — dropped here."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "obj_embeddings_ec": {"embedding": sd["obj_embeddings_ec.weight"]},
        "pred_embeddings_ec": {"embedding": sd["pred_embeddings_ec.weight"]},
        "pred_embeddings_man_dc": {
            "embedding": sd["pred_embeddings_man_dc.weight"]},
    }
    stats = {}
    for name in ("gconv_net_ec", "gconv_net_manipulation", "gconv_net_ec_rel_l"):
        if f"{name}.gconvs.0.net1.0.weight" not in sd:
            continue
        layers = {}
        stats_layers = {}
        i = 0
        while f"{name}.gconvs.{i}.net1.0.weight" in sd:
            p, s = _gconv_auto(sd, f"{name}.gconvs.{i}")
            layers[f"gconv{i}"] = p
            if s is not None:
                stats_layers[f"gconv{i}"] = s
            i += 1
        params[name] = layers
        if stats_layers:
            stats[name] = stats_layers
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# ------------------------------------------------------------ CLIP text tower


def convert_clip_text(sd: Mapping) -> dict:
    """OpenAI CLIP state_dict (full model or text-only) → flax params for
    :class:`~lidarcrafter_tpu.models.clip_text.CLIPTextEncoder`.

    Handles the torch ``nn.MultiheadAttention`` fused ``in_proj_weight`` and
    ``text_projection`` (stored output-last, used as ``pooled @ proj`` — no
    transpose).  cf. the reference's CLIP usage at
    ``lidargen/dataset/transforms_3d/scene_graph/scene_graph.py:146-164``.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        p = f"transformer.resblocks.{i}"
        params[f"resblock{i}"] = {
            "ln_1": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]},
            "attn_in_proj": {"kernel": _linear(sd[f"{p}.attn.in_proj_weight"]),
                             "bias": sd[f"{p}.attn.in_proj_bias"]},
            "attn_out_proj": _lin(sd, f"{p}.attn.out_proj"),
            "ln_2": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]},
            "mlp_c_fc": _lin(sd, f"{p}.mlp.c_fc"),
            "mlp_c_proj": _lin(sd, f"{p}.mlp.c_proj"),
        }
        i += 1
    return {"params": params}


# ------------------------------------------------------------------- GLENet


def convert_glenet(sd: Mapping) -> dict:
    """Reference ``Generator`` state_dict (``lidargen/metrics/models/glenet/
    model.py:151``) → flax variables for
    :class:`~lidarcrafter_tpu.metrics.models.glenet.GLENet` — so the RGF
    metric runs the reference's released uncertainty checkpoints.

    Conv1d(k=1) point layers become Dense; BatchNorm1d splits into
    params(scale/bias) + batch_stats(mean/var)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def dense_from_conv1(prefix):
        w = sd[f"{prefix}.weight"]
        out = {"kernel": w[:, :, 0].T}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def bn(prefix):
        return (
            {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]},
        )

    def pointnet_feat(prefix):
        params, stats = {}, {}
        for i in (1, 2, 3):
            params[f"conv{i}"] = dense_from_conv1(f"{prefix}.conv{i}")
            params[f"bn{i}"], stats[f"bn{i}"] = bn(f"{prefix}.bn{i}")
        params["seq0"] = _lin(sd, f"{prefix}.output_sequential.0")
        params["seq1"] = _lin(sd, f"{prefix}.output_sequential.2")
        return params, stats

    params, stats = {}, {}
    for enc in ("x_encoder", "xy_encoder"):
        fe_p, fe_s = pointnet_feat(f"{enc}.fe")
        params[enc] = {
            "fe": fe_p,
            "fc1": _lin(sd, f"{enc}.fc1"),
            "fc2": _lin(sd, f"{enc}.fc2"),
        }
        stats[enc] = {"fe": fe_s}

    fe_p, fe_s = pointnet_feat("obj_encoder.fe")
    obj = {"fe": fe_p, "fc1": _lin(sd, "obj_encoder.fc1"),
           "fc2": _lin(sd, "obj_encoder.fc2")}
    obj_stats = {"fe": fe_s}
    for i in (1, 2):
        obj[f"bn{i}"], obj_stats[f"bn{i}"] = bn(f"obj_encoder.bn{i}")
    for head in ("fc_s", "fc_ce", "fc_hr", "fc_dir"):
        obj[f"{head}1"] = _lin(sd, f"obj_encoder.{head}1")
        # the *2 head Linears carry no bias (model.py:101-114)
        obj[f"{head}2"] = {"kernel": _linear(sd[f"obj_encoder.{head}2.weight"])}
    params["obj_encoder"] = obj
    stats["obj_encoder"] = obj_stats
    return {"params": params, "batch_stats": stats}


# -------------------------------------------------- pcdet VoxelRCNN-CenterHead


def _spconv_kernel(w, out_ch):
    """spconv weight → (k³, Cin, Cout).  Handles both spconv layouts:
    2.x native (out, kz, ky, kx, in) and 1.x (kz, ky, kx, in, out)."""
    w = np.asarray(w)
    assert w.ndim == 5
    if w.shape[-1] == out_ch and w.shape[0] != out_ch:
        pass  # (kz, ky, kx, in, out)
    elif w.shape[0] == out_ch:
        w = np.transpose(w, (1, 2, 3, 4, 0))  # (out, k..., in) → (k..., in, out)
    return w.reshape(-1, w.shape[-2], w.shape[-1])


def _bn_t(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def _conv2d_t(sd, prefix):
    """torch Conv2d (O, I, kh, kw) → HWIO."""
    out = {"kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def convert_voxel_rcnn(
    sd: Mapping,
    layer_strides=(1, 2),
    upsample_strides=(1, 2),
) -> dict:
    """pcdet VoxelRCNN-CenterHead state_dict → params for
    :class:`~lidarcrafter_tpu.metrics.models.voxel_rcnn.VoxelRCNNCenterHead`.

    Maps the released checkpoint's module names (``backbone_3d.conv_input`` …
    ``dense_head.heads_list.N.<target>``; cf. pcdet spconv_backbone.py /
    base_bev_backbone.py / center_head.py — the reference loads these external
    weights at ``extract_foreground_samples.py:25``).  ``layer_strides`` /
    ``upsample_strides`` come from the yaml (not stored in weights); defaults
    are the standard nuScenes VoxelRCNN-CenterHead config.
    """
    sd = {k: np.asarray(v) for k, v in sd.items() if "num_batches_tracked" not in k}

    def spconv_block(conv_key, bn_key):
        bn = _bn_t(sd, bn_key)
        return {"conv": {"kernel": _spconv_kernel(sd[f"{conv_key}.weight"],
                                                  len(bn["scale"]))},
                "bn": bn}

    b3 = {"conv_input": spconv_block("backbone_3d.conv_input.0",
                                     "backbone_3d.conv_input.1")}
    for stage in ("conv1", "conv2", "conv3", "conv4"):
        blocks = []
        i = 0
        while f"backbone_3d.{stage}.{i}.0.weight" in sd:
            blocks.append(spconv_block(f"backbone_3d.{stage}.{i}.0",
                                       f"backbone_3d.{stage}.{i}.1"))
            i += 1
        b3[stage] = blocks
    b3["conv_out"] = spconv_block("backbone_3d.conv_out.0",
                                  "backbone_3d.conv_out.1")

    # ---- BEV backbone: collect (conv, bn) pairs per block in index order
    b2 = {"blocks": [], "deblocks": []}
    bi = 0
    while any(k.startswith(f"backbone_2d.blocks.{bi}.") for k in sd):
        idxs = sorted(
            {int(k.split(".")[3]) for k in sd
             if k.startswith(f"backbone_2d.blocks.{bi}.") and k.endswith(".weight")
             and sd[k].ndim == 4}
        )
        convs = []
        for j, ci in enumerate(idxs):
            conv = _conv2d_t(sd, f"backbone_2d.blocks.{bi}.{ci}")
            bn = _bn_t(sd, f"backbone_2d.blocks.{bi}.{ci + 1}")
            convs.append({"conv": conv, "bn": bn,
                          "stride": layer_strides[bi] if j == 0 else 1})
        b2["blocks"].append(convs)
        bi += 1
    for di in range(bi):
        s = upsample_strides[di]
        w = sd[f"backbone_2d.deblocks.{di}.0.weight"]
        bn = _bn_t(sd, f"backbone_2d.deblocks.{di}.1")
        if s > 1:  # ConvTranspose2d, torch layout (in, out, kh, kw) kept
            conv = {"tkernel": np.asarray(w)}
        else:
            conv = {"kernel": np.transpose(np.asarray(w), (2, 3, 1, 0))}
        b2["deblocks"].append(
            {"conv": conv, "bn": bn, "stride": s, "transpose": s > 1}
        )

    # ---- CenterHead
    dh = {"shared_conv": {"conv": _conv2d_t(sd, "dense_head.shared_conv.0"),
                          "bn": _bn_t(sd, "dense_head.shared_conv.1")},
          "heads_list": []}
    g = 0
    while any(k.startswith(f"dense_head.heads_list.{g}.") for k in sd):
        names = sorted(
            {k.split(".")[3] for k in sd if k.startswith(f"dense_head.heads_list.{g}.")}
        )
        head = {}
        for name in names:
            p = f"dense_head.heads_list.{g}.{name}"
            layers = []
            j = 0
            while f"{p}.{j}.0.weight" in sd:  # Sequential(conv, bn, relu)
                layers.append({"conv": _conv2d_t(sd, f"{p}.{j}.0"),
                               "bn": _bn_t(sd, f"{p}.{j}.1")})
                j += 1
            layers.append({"conv": _conv2d_t(sd, f"{p}.{j}")})  # final conv
            head[name] = layers
        dh["heads_list"].append(head)
        g += 1

    out = {"backbone_3d": b3, "backbone_2d": b2, "dense_head": dh}

    # ---- VoxelRCNN RoI head (second stage), when present
    if any(k.startswith("roi_head.") for k in sd):
        def conv1x1(prefix):  # Conv1d/Conv2d k=1 (no bias) → (I, O)
            w = np.asarray(sd[f"{prefix}.weight"])
            return {"kernel": w.reshape(w.shape[0], w.shape[1]).T}

        rh = {"roi_grid_pool_layers": []}
        lvl = 0
        while f"roi_head.roi_grid_pool_layers.{lvl}.mlps_in.0.0.weight" in sd:
            base = f"roi_head.roi_grid_pool_layers.{lvl}"
            rh["roi_grid_pool_layers"].append({
                "mlp_in": {"conv": conv1x1(f"{base}.mlps_in.0.0"),
                           "bn": _bn_t(sd, f"{base}.mlps_in.0.1")},
                "mlp_pos": {"conv": conv1x1(f"{base}.mlps_pos.0.0"),
                            "bn": _bn_t(sd, f"{base}.mlps_pos.0.1")},
                "mlp_out": {"conv": conv1x1(f"{base}.mlps_out.0.0"),
                            "bn": _bn_t(sd, f"{base}.mlps_out.0.1")},
            })
            lvl += 1

        def fc_stack(prefix):
            idxs = sorted(
                {int(k[len(prefix) + 1 :].split(".")[0]) for k in sd
                 if k.startswith(prefix + ".") and k.endswith(".weight")
                 and sd[k].ndim == 2}
            )
            return [
                {"conv": {"kernel": _linear(sd[f"{prefix}.{i}.weight"])},
                 "bn": _bn_t(sd, f"{prefix}.{i + 1}")}
                for i in idxs
            ]

        rh["shared_fc_layer"] = fc_stack("roi_head.shared_fc_layer")
        rh["cls_fc_layers"] = fc_stack("roi_head.cls_fc_layers")
        rh["reg_fc_layers"] = fc_stack("roi_head.reg_fc_layers")
        rh["cls_pred_layer"] = _lin(sd, "roi_head.cls_pred_layer")
        rh["reg_pred_layer"] = _lin(sd, "roi_head.reg_pred_layer")
        out["roi_head"] = rh

    return out


# --------------------------------------------------------------------- HDiT


def convert_hdit(sd: Mapping) -> dict:
    """Reference HDiT (``lidargen/models/dits/hdit.py:486-652``) state_dict →
    flax :class:`~lidarcrafter_tpu.models.hdit.HDiT` params.

    Covers the ``nuscenes-hdit-uncond`` checkpoints (``option_dit_nusc.py``):
    tokenizer/detokenizer, learnable or mapped positional embedding, RFF +
    mapping-network time embedding, and every down/mid/up Block
    (AdaRMSNorm-conditioned cosine attention + GEGLU FFN).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def mapping_network(prefix, depth):
        out = {"norm_in": {"scale": sd[f"{prefix}.0.scale"]}}
        for k in range(depth):
            mfn = f"{prefix}.{k + 1}"
            out[f"mlp{k}_norm"] = {"scale": sd[f"{mfn}.norm.scale"]}
            out[f"mlp{k}_gegelu"] = {
                "Dense_0": {"kernel": _linear(sd[f"{mfn}.gegelu.weight"])}
            }
            out[f"mlp{k}_linear"] = {"kernel": _linear(sd[f"{mfn}.linear.weight"])}
        out["norm_out"] = {"scale": sd[f"{prefix}.{depth + 1}.scale"]}
        return out

    def block(prefix):
        a = f"{prefix}.residual_attn"
        f = f"{prefix}.residual_ffn"
        return {
            "attn": {
                "norm": {"proj": {"kernel": _linear(sd[f"{a}.norm.proj.0.weight"])}},
                "scale": sd[f"{a}.scale"],
                "qkv_proj": {"kernel": _linear(sd[f"{a}.qkv_proj.weight"])},
                "out_proj": {"kernel": _linear(sd[f"{a}.out_proj.weight"])},
            },
            "ffn": {
                "adarms": {"proj": {"kernel": _linear(sd[f"{f}.adarms.proj.0.weight"])}},
                "gegelu": {
                    "Dense_0": {"kernel": _linear(sd[f"{f}.gegelu.weight"])}
                },
                "linear": {"kernel": _linear(sd[f"{f}.linear.weight"])},
            },
        }

    # infer depths / mapping depth from the key set (distinct indices —
    # mapping-network MFN blocks are 1-based inside their Sequential)
    def count(pattern):
        hits = set()
        for k in sd:
            m = re.match(pattern, k)
            if m:
                hits.add(int(m.group(1)))
        return len(hits)

    levels = count(r"down_levels\.level_(\d+)\.")
    mid_depth = count(r"mid_levels\.(\d+)\.")
    map_depth = count(r"timestep_pe\.1\.(\d+)\.norm\.scale")

    params = {
        "rff_freqs": sd["timestep_pe.0.freqs"],
        "rff_linear": {"kernel": _linear(sd["timestep_pe.0.linear.weight"])},
        "timestep_mapping": mapping_network("timestep_pe.1", map_depth),
        "tokenizer": {"kernel": _conv(sd["tokenizer.0.weight"])},
        "detok_norm": {"scale": sd["detokenizer.0.scale"]},
        "detok_linear": {"kernel": _linear(sd["detokenizer.1.weight"])},
    }
    if "spatial_pe.embedding" in sd:
        params["spatial_pe"] = sd["spatial_pe.embedding"]
    else:  # AbsolutePositionalEmbedding + MappingNetwork
        params["ape_linear"] = {
            "kernel": _linear(sd["spatial_pe.0.linear.weight"])
        }
        sp_depth = count(r"spatial_pe\.1\.(\d+)\.norm\.scale")
        params["spatial_mapping"] = mapping_network("spatial_pe.1", sp_depth)

    for i in range(levels):
        depth_i = count(rf"down_levels\.level_{i}\.(\d+)\.")
        for j in range(depth_i):
            params[f"down_{i}_{j}"] = block(f"down_levels.level_{i}.{j}")
            params[f"up_{i}_{j}"] = block(f"up_levels.level_{i}.{j}")
        params[f"merge_{i}"] = {
            "kernel": _linear(sd[f"down_levels.merge_{i}.1.weight"])
        }
        params[f"expand_{i}_linear"] = {
            "kernel": _linear(sd[f"up_levels.expand_{i}.linear.weight"])
        }
        params[f"expand_{i}_alpha"] = sd[f"up_levels.expand_{i}.alpha"]
    for j in range(mid_depth):
        params[f"mid_{j}"] = block(f"mid_levels.{j}")
    return {"params": params}


# -------------------------------------------------------------- openai_unet


def _glide_attn(sd, prefix):
    """vendored ``AttentionBlock`` (``openai_unet.py:279-330``): norm +
    1D-conv qkv/proj_out → GLIDEAttentionBlock params."""
    return {
        "norm": _gn(sd, f"{prefix}.norm"),
        "qkv": _conv1d_as_dense(sd, f"{prefix}.qkv"),
        "proj_out": _conv1d_as_dense(sd, f"{prefix}.proj_out"),
    }


def _spatial_transformer(sd, prefix, depth=1):
    """LDM ``SpatialTransformer`` (``attention.py``) → flax params."""
    def dense_nobias(p):
        return {"kernel": _linear(sd[f"{p}.weight"])}

    out = {
        "norm": _gn(sd, f"{prefix}.norm"),
        "proj_in": _lin(sd, f"{prefix}.proj_in") if f"{prefix}.proj_in.bias" in sd
        else dense_nobias(f"{prefix}.proj_in"),
        "proj_out": _lin(sd, f"{prefix}.proj_out")
        if f"{prefix}.proj_out.bias" in sd
        else dense_nobias(f"{prefix}.proj_out"),
    }
    for d in range(depth):
        b = f"{prefix}.transformer_blocks.{d}"
        out[f"block{d}"] = {
            "norm1": _gn(sd, f"{b}.norm1"),
            "norm2": _gn(sd, f"{b}.norm2"),
            "norm3": _gn(sd, f"{b}.norm3"),
            "attn1": {
                "to_q": dense_nobias(f"{b}.attn1.to_q"),
                "to_k": dense_nobias(f"{b}.attn1.to_k"),
                "to_v": dense_nobias(f"{b}.attn1.to_v"),
                "to_out": _lin(sd, f"{b}.attn1.to_out.0"),
            },
            "attn2": {
                "to_q": dense_nobias(f"{b}.attn2.to_q"),
                "to_k": dense_nobias(f"{b}.attn2.to_k"),
                "to_v": dense_nobias(f"{b}.attn2.to_v"),
                "to_out": _lin(sd, f"{b}.attn2.to_out.0"),
            },
            "ff_geglu": {"proj": _lin(sd, f"{b}.ff.net.0.proj")},
            "ff_out": _lin(sd, f"{b}.ff.net.2"),
        }
    return out


def convert_openai_unet(
    sd: Mapping,
    channel_mult=(1, 2, 4, 8),
    num_res_blocks: int = 2,
    attention_resolutions=(4, 8),
    resblock_updown: bool = False,
    use_spatial_transformer: bool = False,
    transformer_depth: int = 1,
) -> dict:
    """Vendored guided-diffusion ``OpenAIUNetModel``
    (``lidargen/models/unets/openai_unet.py:415-776``) state_dict → flax
    :class:`~lidarcrafter_tpu.models.openai_unet.OpenAIUNet` params.

    Replays the input/middle/output block-list construction to map list
    indices onto our named modules — the same recipe as
    :func:`convert_layout_unet`.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def attn(prefix):
        if use_spatial_transformer:
            return _spatial_transformer(sd, prefix, transformer_depth)
        return _glide_attn(sd, prefix)

    params = {
        "time_dense1": _lin(sd, "time_embed.0"),
        "time_dense2": _lin(sd, "time_embed.2"),
        "in_conv": _conv3(sd, "input_blocks.0.0"),
        "out_norm": _gn(sd, "out.0"),
        "out_conv": _conv3(sd, "out.2"),
    }
    if "label_emb.weight" in sd:
        params["label_emb"] = {"embedding": sd["label_emb.weight"]}

    ds, idx = 1, 1
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            params[f"in_{level}_{i}_res"] = _adm_resblock(sd, f"input_blocks.{idx}.0")
            if ds in attention_resolutions:
                params[f"in_{level}_{i}_attn"] = attn(f"input_blocks.{idx}.1")
            idx += 1
        if level != len(channel_mult) - 1:
            if resblock_updown:
                params[f"in_{level}_down"] = _adm_resblock(sd, f"input_blocks.{idx}.0")
            elif f"input_blocks.{idx}.0.op.weight" in sd:
                params[f"in_{level}_down"] = {"op": _conv3(sd, f"input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    params["mid_res1"] = _adm_resblock(sd, "middle_block.0")
    params["mid_attn"] = attn("middle_block.1")
    params["mid_res2"] = _adm_resblock(sd, "middle_block.2")

    idx = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            params[f"out_{level}_{i}_res"] = _adm_resblock(sd, f"output_blocks.{idx}.0")
            off = 1
            if ds in attention_resolutions:
                params[f"out_{level}_{i}_attn"] = attn(f"output_blocks.{idx}.{off}")
                off += 1
            if level and i == num_res_blocks:
                if resblock_updown:
                    params[f"out_{level}_up"] = _adm_resblock(
                        sd, f"output_blocks.{idx}.{off}"
                    )
                elif f"output_blocks.{idx}.{off}.conv.weight" in sd:
                    params[f"out_{level}_up"] = {
                        "conv": _conv3(sd, f"output_blocks.{idx}.{off}.conv")
                    }
                ds //= 2
            idx += 1
    return {"params": params}


# ---------------------------------------------------------------- refinenet


def convert_refinenet(sd: Mapping) -> dict:
    """``LiDARGenRefineNet`` (``lidargen/models/refinenet.py:157-233``)
    state_dict → flax params (NCSN legacy backbone)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def conv(p, bias=True):
        out = {"kernel": _conv(sd[f"{p}.weight"])}
        if bias:
            out["bias"] = sd[f"{p}.bias"]
        return out

    def circ(p, bias=True):
        return {"Conv_0": conv(p, bias)}

    def inorm(p):
        return {
            "alpha": sd[f"{p}.alpha"].reshape(-1),
            "post_weight": sd[f"{p}.post_affine.weight"].reshape(-1),
            "post_bias": sd[f"{p}.post_affine.bias"],
        }

    def resblock(p):
        # conv2/skip become Sequential(conv, avgpool) when downsampling at
        # dilation 1 (refinenet.py:79-81) — keys gain a ".0"
        c2 = f"{p}.conv2.0" if f"{p}.conv2.0.weight" in sd else f"{p}.conv2"
        out = {
            "norm1": inorm(f"{p}.norm1"),
            "conv1": circ(f"{p}.conv1"),
            "norm2": inorm(f"{p}.norm2"),
            "conv2": circ(c2),
        }
        for sk in (f"{p}.skip.0", f"{p}.skip"):
            if f"{sk}.weight" in sd:
                out["skip"] = circ(sk)
                break
        return out

    def rcu(p, num_blocks=2, num_stages=2):
        return {
            f"b{b}s{s}": circ(f"{p}.units.{b}.{2 * s + 1}", bias=False)
            for b in range(num_blocks)
            for s in range(num_stages)
        }

    def refineblock(p, num_inputs, num_end_blocks=1):
        out = {}
        for i in range(num_inputs):
            out[f"rcu{i}"] = rcu(f"{p}.adaptive_convs.{i}.0")
            if num_inputs > 1:
                out[f"adapt{i}"] = circ(f"{p}.adaptive_convs.{i}.1")
        out["crp"] = {
            f"crp{s}": circ(f"{p}.crp.convs.{s}.1", bias=False) for s in range(2)
        }
        out["out_rcu"] = rcu(f"{p}.output_conv", num_blocks=num_end_blocks)
        return out

    params = {
        "in_conv": conv("in_conv"),
        "out_norm": inorm("out_conv.0"),
        "out_conv": conv("out_conv.2"),
    }
    for d, name in ((1, "d1"), (2, "d2"), (3, "d3"), (4, "d4")):
        params[f"{name}a"] = resblock(f"d_block{d}.0")
        params[f"{name}b"] = resblock(f"d_block{d}.1")
    params["u4"] = refineblock("u_block4", 1)
    params["u3"] = refineblock("u_block3", 2)
    params["u2"] = refineblock("u_block2", 2)
    params["u1"] = refineblock("u_block1", 2, num_end_blocks=3)
    return {"params": params}


# ------------------------------------------------- config-driven ingestion


def ingest_checkpoint_for_config(cfg, path: str, use_ema: bool = True):
    """One call from a reference ``.pth`` to the params pytree our sampling
    CLIs expect for ``cfg`` — the migration path for released checkpoints
    (reference loaders: ``inference.py:28-117``).

    The reference saves the ENGINE state_dict ({'weights', 'ema_weights',
    'cfg', ...}, ``train_lidm.py:249-259``), nesting the denoiser under
    ``model.`` and the condition encoder under ``condition_model.``.
    Returns the denoiser variables for unconditional/flow configs, or
    ``{"model": ..., "cond": ...}`` for conditional stacks (matching
    ``tools/generate*.py``'s init trees).
    """
    sd, _ = load_torch_checkpoint(path, use_ema)
    if any(k.startswith("ema_model.") for k in sd):  # ema.state_dict() form
        sd = strip_prefix(sd, "ema_model.")
    model_sd = (
        strip_prefix(sd, "model.")
        if any(k.startswith("model.") for k in sd)
        else sd
    )
    cond_sd = strip_prefix(sd, "condition_model.")

    arch = cfg.model.architecture
    mp = dict(cfg.model.params)
    if arch in ("efficient_unet", "efficient_unet_cond", "mf_efficient_unet"):
        model = convert_efficient_unet(
            model_sd,
            attn_num_heads=mp.get("attn_num_heads", 8),
            mf=(arch == "mf_efficient_unet"),
        )
    elif arch == "hdit":
        model = convert_hdit(model_sd)
    elif arch in ("layout_unet", "layout_unet_v1"):
        model = convert_layout_unet(
            model_sd,
            channel_mult=tuple(mp.get("channel_mult", (1, 2, 4, 8))),
            num_res_blocks=mp.get("num_res_blocks", 2),
            attention_ds=tuple(mp.get("attention_ds", (4, 8))),
            num_attention_blocks=mp.get("num_attention_blocks", 1),
        )
    elif arch == "unet_1d":
        model = convert_unet_1d(
            model_sd,
            channel_mult=tuple(mp.get("channel_mult", (1, 1, 1, 1))),
            num_res_blocks=mp.get("num_res_blocks", 2),
            attention_resolutions=tuple(mp.get("attention_resolutions", (4, 2))),
            transformer_depth=mp.get("transformer_depth", 1),
        )
    elif arch == "point_unet":
        model = convert_point_unet(model_sd)
    else:
        raise ValueError(
            f"no ingestion for model architecture {arch!r}; use the "
            f"family-specific convert_* functions in utils/torch_ckpt.py"
        )

    cm = getattr(cfg, "condition_model", None)
    if cm is None or not cond_sd:
        return model
    carch = cm.architecture
    if carch.startswith("layout_encoder"):
        cond = convert_layout_encoder(cond_sd)
    elif carch == "scene_graph":
        cond = convert_scene_graph(cond_sd)
    elif carch == "object_gen_encoder":
        cond = convert_object_gen_encoder(cond_sd)
    else:
        raise ValueError(f"no ingestion for condition model {carch!r}")
    return {"model": model, "cond": cond}
