"""Native JAX CLIP text encoder (ViT-B/32 text tower).

The reference re-encodes scene-graph relationship text with OpenAI CLIP at
inference time when the user edits a graph
(``lidargen/dataset/nuscenes_dataset.py:571-576``, CLIP call at
``lidargen/dataset/transforms_3d/scene_graph/scene_graph.py:146-164``) and in
the offline data pipeline (``tools/data_converter/
generate_nusc_obj_text_feature.py:5-27``).  This module is the TPU-native
replacement: the standard CLIP text transformer (pre-LN, QuickGELU, causal
mask, EOT pooling + text projection) in flax, driven by weights converted from
an OpenAI CLIP checkpoint (``utils.torch_ckpt.convert_clip_text``) and the
byte-BPE tokenizer in ``utils.clip_tokenizer``.

Defaults are the ViT-B/32 text-tower dimensions (vocab 49408, context 77,
width 512, 8 heads, 12 layers, 512-d output).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block with fused qkv, matching CLIP's
    ``ResidualAttentionBlock`` (torch ``nn.MultiheadAttention`` packing)."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, L, C = x.shape
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * C, name="attn_in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        dh = C // self.heads

        def heads(t):
            return t.reshape(B, L, self.heads, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhtc,bhsc->bhts", q, k) / float(np.sqrt(dh))
        logits = logits + mask[None, None]
        w = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
        o = jnp.einsum("bhts,bhsc->bhtc", w, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, C)
        x = x + nn.Dense(C, name="attn_out_proj")(o)

        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * C, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(C, name="mlp_c_proj")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """CLIP text tower; ``__call__(token_ids (B, L) int32) → (B, embed_dim)``.

    Features are taken at each sequence's EOT token (the argmax token id,
    since EOT is the largest id in the vocab), layer-normed, and projected —
    exactly CLIP's ``encode_text``.
    """

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        B, L = tokens.shape
        x = nn.Embed(self.vocab_size, self.width, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos[None, :L]
        mask = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, name=f"resblock{i}")(
                x, mask
            )
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)  # EOT has the largest token id
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
        )
        return pooled @ proj


def load_clip_text_encoder(ckpt_path, bpe_path, jit: bool = True):
    """Build a ready-to-call text encoder from an OpenAI CLIP checkpoint
    (TorchScript archive or plain state_dict) + BPE merges file.

    Returns ``(encode_fn, tokenizer, model, variables)`` where
    ``encode_fn(list[str]) → np.ndarray (N, embed_dim)`` — a drop-in
    ``text_encode_fn`` for :class:`~lidarcrafter_tpu.datasets.scene_graph.
    SceneGraphAssigner` (reference CLIP call:
    ``scene_graph/scene_graph.py:146-164``).
    """
    import jax

    from ..utils.clip_tokenizer import CLIPTokenizer
    from ..utils.torch_ckpt import convert_clip_text

    sd = _load_torch_state_dict(ckpt_path)
    sd = {k: np.asarray(v) for k, v in sd.items() if "visual." not in k}
    width = sd["ln_final.weight"].shape[0]
    heads = width // 64
    layers = sum(1 for k in sd if k.endswith(".ln_1.weight"))
    model = CLIPTextEncoder(
        vocab_size=sd["token_embedding.weight"].shape[0],
        context_length=sd["positional_embedding"].shape[0],
        width=width,
        heads=heads,
        layers=layers,
        embed_dim=sd["text_projection"].shape[1],
    )
    variables = convert_clip_text(sd)
    tokenizer = CLIPTokenizer(bpe_path)
    apply = jax.jit(model.apply) if jit else model.apply

    def encode_fn(texts):
        tokens = tokenizer.tokenize(texts, model.context_length)
        return np.asarray(apply(variables, tokens))

    return encode_fn, tokenizer, model, variables


def _load_torch_state_dict(ckpt_path):
    """torch.load a CLIP checkpoint; TorchScript archives (the official
    ``ViT-B/32.pt``) fall back to ``torch.jit.load``."""
    import torch

    try:
        obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    except RuntimeError:
        obj = torch.jit.load(ckpt_path, map_location="cpu")
    if hasattr(obj, "state_dict") and not isinstance(obj, dict):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.float().numpy() for k, v in obj.items()}
