"""Layout transformer encoder (CLIP-ViT style) in flax.

TPU-native re-design of ``lidargen/models/unets/layout_encoder.py:140-303``:
encodes up to ``layout_length`` objects (class embedding + 3D-box(8d) linear +
2D-box(4d) linear) through a pre-LN transformer, emitting

- ``xf_out``  (B, L, hidden)    — layout tokens,
- ``xf_proj`` (B, output_dim)   — pooled (token 0) projection added to temb,
- ``obj_class_embedding`` / ``obj_bbox_embedding`` (B, L, hidden),
- ``image_patch_bbox_embedding_for_resolution{r}`` (B, L1_r, hidden) —
  normalized patch-bbox embeddings per attention resolution,
- ``key_padding_mask`` (B, L) — True where the slot is padding,
- ``concat_cond`` passthrough (+ ``autoregressive_cond`` concat,
  cf. ``layout_encoder.py:298-302``).

Token tensors are (B, L, C) (the reference uses (B, C, L)); the consuming
attention transposes as needed.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn


class QKVAttention(nn.Module):
    """Packed-QKV multi-head attention; cf. ``layout_encoder.py:61-84``."""

    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_padding_mask=None) -> jnp.ndarray:
        B, L, width = x.shape
        qkv = nn.Dense(width * 3, name="c_qkv")(x)
        qkv = qkv.reshape(B, L, self.num_heads, -1)
        ch = width // self.num_heads
        q, k, v = jnp.split(qkv, [ch, 2 * ch], axis=-1)
        scale = float(1.0 / np.sqrt(np.sqrt(ch)))
        logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :], -jnp.inf, logits
            )
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
        out = jnp.einsum("bhts,bshc->bthc", weights, v).reshape(B, L, width)
        return nn.Dense(width, name="c_proj")(out)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN attn + MLP residual block; cf. ``layout_encoder.py:87-108``."""

    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_padding_mask=None) -> jnp.ndarray:
        width = x.shape[-1]
        h = nn.LayerNorm(name="ln_1")(x)
        x = x + QKVAttention(self.num_heads, name="attn")(h, key_padding_mask)
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(width * 4, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(width, name="mlp_proj")(h)
        return x


def image_patch_bboxes(feature_map_size: Sequence[int], ds: int) -> np.ndarray:
    """Normalized (x1, y1, x2, y2) of each feature-map patch at downsample ``ds``.

    cf. ``layout_encoder.py:212-217``: rows sweep H, cols sweep W (row-major).
    """
    nh = int(feature_map_size[0] / ds)
    nw = int(feature_map_size[1] / ds)
    ii = 1.0 / nh
    jj = 1.0 / nw
    out = [
        (jj * j, ii * i, jj * (j + 1), ii * (i + 1))
        for i in range(nh)
        for j in range(nw)
    ]
    return np.asarray(out, np.float32)  # (nh*nw, 4)


class LayoutTransformerEncoder(nn.Module):
    feature_map_size: Sequence[int] = (32, 1024)
    layout_length: int = 13
    hidden_dim: int = 64
    output_dim: int = 256
    num_layers: int = 6
    num_heads: int = 4
    use_final_ln: bool = True
    num_classes_for_layout_object: int = 9
    mask_size_for_layout_object: int = 32
    used_condition_types: Sequence[str] = ("obj_class", "obj_bbox", "is_valid_obj")
    use_positional_embedding: bool = False
    resolution_to_attention: Sequence[int] = ()
    use_key_padding_mask: bool = False
    not_use_layout_fusion_module: bool = False
    fov_up: float = 10.0
    fov_down: float = -30.0
    out_channels: int = 10  # concat-cond channels consumed by the engine

    @nn.compact
    def __call__(self, condition_dict: dict) -> dict:
        obj_bbox = condition_dict["scaled_gt_boxes"][..., :8]
        obj_bbox_2d = condition_dict["gt_boxes_2d"]
        obj_class = condition_dict["scaled_gt_boxes"][..., -1]
        is_valid_obj = condition_dict["is_valid_obj"]
        B = obj_bbox.shape[0]

        outputs: dict = {}
        xf_in = None
        if self.use_positional_embedding:
            pos = self.param(
                "positional_embedding",
                nn.initializers.normal(1.0),
                (self.layout_length, self.hidden_dim),
            )
            xf_in = jnp.broadcast_to(pos[None], (B, *pos.shape))

        if "obj_class" in self.used_condition_types:
            cls_emb = nn.Embed(
                self.num_classes_for_layout_object,
                self.hidden_dim,
                name="obj_class_embedding",
            )(obj_class.astype(jnp.int32))
            xf_in = cls_emb if xf_in is None else xf_in + cls_emb
            outputs["obj_class_embedding"] = cls_emb  # (B, L, hidden)

        if "obj_bbox" in self.used_condition_types:
            bbox_dense = nn.Dense(self.hidden_dim, name="obj_bbox_embedding")
            bbox2d_dense = nn.Dense(self.hidden_dim, name="obj_bbox_2d_embedding")
            emb3d = bbox_dense(obj_bbox)
            emb2d = bbox2d_dense(obj_bbox_2d)
            xf_in = emb3d + emb2d if xf_in is None else xf_in + emb3d + emb2d
            outputs["obj_bbox_embedding"] = emb2d  # (B, L, hidden), 2D variant
            for ds in self.resolution_to_attention:
                key = f"image_patch_bbox_embedding_for_resolution{int(self.feature_map_size[0] / ds)}"
                patches = jnp.asarray(image_patch_bboxes(self.feature_map_size, ds))
                emb = bbox2d_dense(patches)  # (L1, hidden)
                outputs[key] = jnp.broadcast_to(emb[None], (B, *emb.shape))

        if "obj_mask" in self.used_condition_types:
            m = condition_dict["obj_mask"]
            m = m.reshape(*m.shape[:2], -1)
            memb = nn.Dense(self.hidden_dim, name="obj_mask_embedding")(m)
            xf_in = memb if xf_in is None else xf_in + memb

        if "is_valid_obj" in self.used_condition_types:
            outputs["key_padding_mask"] = (1 - is_valid_obj).astype(bool)

        kpm = outputs.get("key_padding_mask") if self.use_key_padding_mask else None
        xf_out = xf_in
        if not self.not_use_layout_fusion_module:
            for i in range(self.num_layers):
                xf_out = ResidualAttentionBlock(self.num_heads, name=f"resblock{i}")(
                    xf_out, kpm
                )
        if self.use_final_ln:
            xf_out = nn.LayerNorm(name="final_ln")(xf_out)
        xf_proj = nn.Dense(self.output_dim, name="transformer_proj")(xf_out[:, 0])

        outputs["xf_proj"] = xf_proj
        outputs["xf_out"] = xf_out  # (B, L, hidden)
        if "concat_cond" in condition_dict:
            if "autoregressive_cond" in condition_dict:
                outputs["concat_cond"] = jnp.concatenate(
                    [condition_dict["concat_cond"], condition_dict["autoregressive_cond"]],
                    axis=-1,  # NHWC channel concat
                )
            else:
                outputs["concat_cond"] = condition_dict["concat_cond"]
        return outputs


class LayoutTransformerEncoderV5(LayoutTransformerEncoder):
    """v5 variant; cf. ``encoders/layout_encoder_v5.py`` (diff vs base):
    the 3D-box linear embedding is replaced by an :class:`ObjectGenEncoder`
    over the per-object condition encoding (``fg_encoding_box`` 8-d) + class
    text features, and ``autoregressive_cond`` is not concatenated.

    ``condition_dict`` additionally carries ``fg_encoding_box`` (B, L, 8) and
    ``fg_text_features`` (9, 512) — the CLIP class table (class 0 = unknown).
    """

    @nn.compact
    def __call__(self, condition_dict: dict) -> dict:
        from .point_unet import ObjectGenEncoder

        obj_bbox_2d = condition_dict["gt_boxes_2d"]
        obj_class = condition_dict["scaled_gt_boxes"][..., -1]
        is_valid_obj = condition_dict["is_valid_obj"]
        B, L = obj_class.shape

        outputs: dict = {}
        cls_emb = nn.Embed(
            self.num_classes_for_layout_object, self.hidden_dim,
            name="obj_class_embedding",
        )(obj_class.astype(jnp.int32))
        outputs["obj_class_embedding"] = cls_emb

        bbox2d_dense = nn.Dense(self.hidden_dim, name="obj_bbox_2d_embedding")
        emb2d = bbox2d_dense(obj_bbox_2d)
        emb3d = ObjectGenEncoder(
            num_class=self.num_classes_for_layout_object,
            input_dim=8,
            proj_dims=(
                self.hidden_dim * 8, self.hidden_dim * 4,
                self.hidden_dim * 4, self.hidden_dim,
            ),
            name="obj_bbox_3d_embedding",
        )(
            {
                "fg_encoding_box": condition_dict["fg_encoding_box"],
                "fg_class": obj_class,
                "fg_text_features": condition_dict["fg_text_features"],
            }
        )
        xf_in = cls_emb + emb3d + emb2d
        outputs["obj_bbox_embedding"] = emb2d
        for ds in self.resolution_to_attention:
            key = f"image_patch_bbox_embedding_for_resolution{int(self.feature_map_size[0] / ds)}"
            patches = jnp.asarray(image_patch_bboxes(self.feature_map_size, ds))
            emb = bbox2d_dense(patches)
            outputs[key] = jnp.broadcast_to(emb[None], (B, *emb.shape))

        outputs["key_padding_mask"] = (1 - is_valid_obj).astype(bool)
        kpm = outputs["key_padding_mask"] if self.use_key_padding_mask else None
        xf_out = xf_in
        if not self.not_use_layout_fusion_module:
            for i in range(self.num_layers):
                xf_out = ResidualAttentionBlock(self.num_heads, name=f"resblock{i}")(
                    xf_out, kpm
                )
        if self.use_final_ln:
            xf_out = nn.LayerNorm(name="final_ln")(xf_out)
        outputs["xf_proj"] = nn.Dense(self.output_dim, name="transformer_proj")(
            xf_out[:, 0]
        )
        outputs["xf_out"] = xf_out
        if "concat_cond" in condition_dict:
            outputs["concat_cond"] = condition_dict["concat_cond"]
        return outputs
