"""Per-object point-cloud denoiser + box/class condition encoder (flax).

Re-designs ``lidargen/models/unets/point_unet.py:14-72`` (PointUNet: 6 gated
linear PCNet layers over (B, N, point_dim) box-normalized points) and
``encoders/object_gen_encoder.py:8-89`` (NeRF-Fourier box embedding + frozen
CLIP class-text feature → 768-d condition).  The CLIP text features are data,
not weights: they are passed in as a (num_class, 512) table
(``fg_text_features``) instead of being unpickled inside the model
(``object_gen_encoder.py:28-35``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn


class PCNet(nn.Module):
    """Gated linear conditioning layer; cf. ``point_unet.py:14-25``."""

    dim_out: int

    @nn.compact
    def __call__(self, fea: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        gate = nn.sigmoid(nn.Dense(self.dim_out, name="cond_gate")(cond))
        bias = nn.Dense(self.dim_out, use_bias=False, name="cond_bias")(cond)
        return nn.Dense(self.dim_out, name="fea_layer")(fea) * gate + bias


class PointUNet(nn.Module):
    """cf. ``point_unet.py:28-72``; ``__call__(coords (B,N,D), cond_dict)``.

    ``cond_dict`` = {'time_condition': (B,), 'other_condition': (B, F)}.
    """

    point_dim: int = 4
    cond_dims: int = 768
    residual: bool = True

    @property
    def in_channels(self) -> int:
        return self.point_dim

    @nn.compact
    def __call__(self, coords: jnp.ndarray, cond_dict: dict) -> jnp.ndarray:
        B = coords.shape[0]
        beta = cond_dict["time_condition"].reshape(B, 1, 1)
        cond = cond_dict["other_condition"].reshape(B, 1, -1)
        time_emb = jnp.concatenate([beta, jnp.sin(beta), jnp.cos(beta)], axis=-1)
        cond_emb = jnp.concatenate([time_emb, cond], axis=-1)  # (B, 1, F+3)

        dims = [128, 256, 512, 256, 128, self.point_dim]
        out = coords
        for i, d in enumerate(dims):
            out = PCNet(d, name=f"layer{i}")(out, cond_emb)
            if i < len(dims) - 1:
                out = nn.leaky_relu(out, negative_slope=0.01)
        return coords + out if self.residual else out


def nerf_fourier_embed(x: jnp.ndarray, num_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """NeRF positional embedding; cf. ``encoders/embedder.py:5-54``.

    freq bands 2^0..2^(num_freqs-1); per freq appends sin then cos.
    """
    outs = [x] if include_input else []
    for k in range(num_freqs):
        freq = 2.0**k
        outs.append(jnp.sin(x * freq))
        outs.append(jnp.cos(x * freq))
    return jnp.concatenate(outs, axis=-1)


class ObjectGenEncoder(nn.Module):
    """cf. ``encoders/object_gen_encoder.py:8-66``.

    ``__call__(input_dict)`` with keys ``fg_encoding_box`` (B, input_dim),
    ``fg_class`` (B,) int, and ``fg_text_features`` (num_class, class_token_dim)
    — the precomputed CLIP table (cf. ``prepare``, :28-35``).
    """

    num_class: int = 8
    input_dim: int = 6
    embedder_num_freq: int = 4
    class_token_dim: int = 512
    output_num: int = 1
    proj_dims: Sequence[int] = (768, 512, 512, 768)

    @nn.compact
    def __call__(self, input_dict: dict) -> jnp.ndarray:
        bboxes = input_dict["fg_encoding_box"]
        classes = input_dict["fg_class"].astype(jnp.int32)
        text_table = input_dict["fg_text_features"]  # (num_class, 512)

        pos_emb = nerf_fourier_embed(bboxes, self.embedder_num_freq)
        emb = nn.Dense(self.proj_dims[0], name="bbox_proj")(pos_emb)
        emb = nn.silu(emb)
        cls_emb = text_table[classes.reshape(-1)].reshape(
            *classes.shape, text_table.shape[-1]
        )
        emb = jnp.concatenate([emb, cls_emb], axis=-1)
        emb = nn.Dense(self.proj_dims[1], name="second0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.proj_dims[2], name="second1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.proj_dims[3], name="second2")(emb)
        return emb
