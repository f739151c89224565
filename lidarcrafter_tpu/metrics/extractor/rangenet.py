"""RangeNet21/53 range-image segmentation backbone (FRID extractor), flax.

Re-designs ``lidargen/metrics/extractor/rangenet.py:19-183`` (RangeNet trunk,
darknet-style encoder + transposed-conv decoder with detached skip adds) and
``Preprocess`` (:515-535).  Inference-only (frozen BN); the FRID feature is
the decoder fmap flattened and subsampled at 4096 fixed positions
(``flatten_and_subsample:150-155`` — ``random.seed(0)`` sample, reproduced
exactly).  ``convert_rangenet_state_dict`` ingests the reference torch
weights (which themselves ingest the official darknet tars).
"""

from __future__ import annotations

import random as _pyrandom
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pointnet import FrozenBN


class ConvBNLReLU(nn.Module):
    """Conv (or exact torch ConvTranspose) + frozen BN + LeakyReLU(0.1)."""

    out_ch: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int]
    padding: tuple[int, int]
    transposed: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        ph, pw = self.padding
        if not self.transposed:
            x = nn.Conv(
                self.out_ch, (kh, kw), strides=self.stride,
                padding=((ph, ph), (pw, pw)), use_bias=self.use_bias, name="conv",
            )(x)
        else:
            # torch ConvTranspose2d semantics: lax.conv_transpose with
            # transpose_kernel and padding (k-1-p) per side
            in_ch = x.shape[-1]
            kernel = self.param(
                "conv_kernel", nn.initializers.lecun_normal(), (kh, kw, self.out_ch, in_ch)
            )
            x = jax.lax.conv_transpose(
                x,
                kernel,
                strides=self.stride,
                padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
            )
            if self.use_bias:
                x = x + self.param("conv_bias", nn.initializers.zeros, (self.out_ch,))
        x = FrozenBN(name="bn")(x)
        return nn.leaky_relu(x, negative_slope=0.1)


class ResidualBlock(nn.Module):
    """1x1 reduce + 3x3 expand residual; cf. ``rangenet.py:52-61``."""

    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = ConvBNLReLU(self.mid_ch, (1, 1), (1, 1), (0, 0), name="reduce")(x)
        h = ConvBNLReLU(self.out_ch, (3, 3), (1, 1), (1, 1), name="expand")(h)
        return x + h


class RangeNetBlock(nn.Module):
    """cf. ``rangenet.py:64-108``."""

    in_ch: int
    out_ch: int
    num_blocks: int
    mode: str = "same"

    @nn.compact
    def __call__(self, x):
        if self.mode == "same":
            conv = ConvBNLReLU(self.out_ch, (3, 3), (1, 1), (1, 1), name="conv")
        elif self.mode == "down":
            conv = ConvBNLReLU(self.out_ch, (3, 3), (1, 2), (1, 1), name="conv")
        elif self.mode == "up":
            conv = ConvBNLReLU(
                self.out_ch, (1, 4), (1, 2), (0, 1), transposed=True, use_bias=True,
                name="conv",
            )
        else:
            raise ValueError(self.mode)
        h = conv(x)
        for i in range(self.num_blocks):
            h = ResidualBlock(self.in_ch, self.out_ch, name=f"res{i}")(h)
        return h


class RangeNet(nn.Module):
    """cf. ``rangenet.py:111-183``; NHWC, frozen inference.

    ``__call__(img, feature=None)``: feature='lidargen' → (B, 4096) FRID
    features; 'decoder' → decoder fmap; None → segmentation logits.
    """

    num_classes: int = 20
    in_ch: int = 5
    backbone: int = 53

    @nn.compact
    def __call__(self, img, feature: str | None = None):
        nrb = {21: [1, 1, 2, 2, 1], 53: [1, 2, 8, 8, 4]}[self.backbone]
        ch = lambda i: 32 << i
        h0 = ConvBNLReLU(32, (3, 3), (1, 1), (1, 1), name="stem")(img)
        h1 = RangeNetBlock(ch(0), ch(1), nrb[0], "down", name="enc1")(h0)
        h2 = RangeNetBlock(ch(1), ch(2), nrb[1], "down", name="enc2")(h1)
        h3 = RangeNetBlock(ch(2), ch(3), nrb[2], "down", name="enc3")(h2)
        h4 = RangeNetBlock(ch(3), ch(4), nrb[3], "down", name="enc4")(h3)
        h5 = RangeNetBlock(ch(4), ch(5), nrb[4], "down", name="enc5")(h4)
        h = RangeNetBlock(ch(5), ch(4), 1, "up", name="dec5")(h5) + h4
        h = RangeNetBlock(ch(4), ch(3), 1, "up", name="dec4")(h) + h3
        h = RangeNetBlock(ch(3), ch(2), 1, "up", name="dec3")(h) + h2
        h = RangeNetBlock(ch(2), ch(1), 1, "up", name="dec2")(h) + h1
        h = RangeNetBlock(ch(1), ch(0), 1, "up", name="dec1")(h) + h0
        if feature == "lidargen":
            return flatten_and_subsample(h)
        if feature == "decoder":
            return h
        return nn.Conv(
            self.num_classes, (3, 3), padding=((1, 1), (1, 1)), name="head"
        )(h)


def flatten_and_subsample(fmaps: jnp.ndarray) -> jnp.ndarray:
    """cf. ``rangenet.py:150-155``: fixed random.seed(0) 4096-feature subsample
    of the flattened (C·H·W) decoder map — torch flattening is CHW-major, so
    transpose NHWC → NCHW before flattening for identical indices."""
    B, H, W, C = fmaps.shape
    flat = jnp.transpose(fmaps, (0, 3, 1, 2)).reshape(B, C * H * W)
    _pyrandom.seed(0)
    idx = np.asarray(_pyrandom.sample(range(C * H * W), 4096))
    return flat[:, idx]


def preprocess_range_input(img: jnp.ndarray, mask: jnp.ndarray | None = None):
    """cf. ``Preprocess`` (:515-535): zero out empty pixels (channel order
    range, x, y, z, remission); normalization is disabled in the reference."""
    if mask is None:
        mask = (img[..., 0:1] > 0).astype(img.dtype)
    return img * mask


def convert_rangenet_state_dict(sd) -> dict:
    """torch RangeNet state_dict → flax params (frozen BN)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def cbl(prefix, transposed=False, bias=False):
        w = sd[f"{prefix}.0.weight"]
        out = {}
        if transposed:
            # torch ConvT weight (I, O, kh, kw) → HWOI
            out["conv_kernel"] = np.transpose(w, (2, 3, 1, 0))
            if bias:
                out["conv_bias"] = sd[f"{prefix}.0.bias"]
        else:
            out["conv"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
            if f"{prefix}.0.bias" in sd:
                out["conv"]["bias"] = sd[f"{prefix}.0.bias"]
        out["bn"] = {
            "scale": sd[f"{prefix}.1.weight"],
            "bias": sd[f"{prefix}.1.bias"],
            "mean": sd[f"{prefix}.1.running_mean"],
            "var": sd[f"{prefix}.1.running_var"],
        }
        return out

    def block(prefix, num_blocks, up=False):
        out = {"conv": cbl(f"{prefix}.conv", transposed=up, bias=up)}
        for i in range(num_blocks):
            out[f"res{i}"] = {
                "reduce": cbl(f"{prefix}.residual_blocks.{i}.residual.0"),
                "expand": cbl(f"{prefix}.residual_blocks.{i}.residual.1"),
            }
        return out

    nrb = [1, 2, 8, 8, 4] if any("enc3.residual_blocks.7" in k for k in sd) else [1, 1, 2, 2, 1]
    params = {"stem": cbl("stem")}
    for i, n in enumerate(nrb):
        params[f"enc{i + 1}"] = block(f"enc{i + 1}", n)
    for i in range(5, 0, -1):
        params[f"dec{i}"] = block(f"dec{i}", 1, up=True)
    params["head"] = {
        "kernel": np.transpose(sd["head.1.weight"], (2, 3, 1, 0)),
        "bias": sd["head.1.bias"],
    }
    return {"params": params}


def convert_rangenet_folder(backbone_sd, decoder_sd, head=None) -> dict:
    """Pretrained eval-folder format → flax params.

    The reference's FRID checkpoints ship as separate raw state_dicts
    (``{folder}/backbone`` + ``{folder}/segmentation_decoder``, loaded by
    ``metrics/models/rangenet/model.py:330-336``) with darknet naming:
    ``conv1/bn1``, ``enc{k}.{conv,bn,residual_{i}.conv1/bn1/conv2/bn2}``,
    ``dec{j}.{upconv|conv,bn,residual.*}``.  ``head`` (num-class conv) is
    optional — the FRID feature path stops at the decoder.
    """
    b = {k: np.asarray(v) for k, v in backbone_sd.items()}
    d = {k: np.asarray(v) for k, v in decoder_sd.items()}

    def conv(sd, name, transposed=False):
        w = sd[f"{name}.weight"]
        k = np.transpose(w, (2, 3, 1, 0))
        return k

    def bn(sd, name):
        return {
            "scale": sd[f"{name}.weight"],
            "bias": sd[f"{name}.bias"],
            "mean": sd[f"{name}.running_mean"],
            "var": sd[f"{name}.running_var"],
        }

    def cbl(sd, cname, bname, transposed=False, bias=False):
        out = {}
        if transposed:
            w = sd[f"{cname}.weight"]  # torch ConvT (I, O, kh, kw) → HWOI
            out["conv_kernel"] = np.transpose(w, (2, 3, 1, 0))
            if bias and f"{cname}.bias" in sd:
                out["conv_bias"] = sd[f"{cname}.bias"]
        else:
            out["conv"] = {"kernel": conv(sd, cname)}
            if f"{cname}.bias" in sd:
                out["conv"]["bias"] = sd[f"{cname}.bias"]
        out["bn"] = bn(sd, bname)
        return out

    def res(sd, prefix):
        return {
            "reduce": cbl(sd, f"{prefix}.conv1", f"{prefix}.bn1"),
            "expand": cbl(sd, f"{prefix}.conv2", f"{prefix}.bn2"),
        }

    nrb = [1, 2, 8, 8, 4] if any(
        k.startswith("enc3.residual_7") for k in b
    ) else [1, 1, 2, 2, 1]
    params = {"stem": cbl(b, "conv1", "bn1")}
    for i, n in enumerate(nrb):
        e = {"conv": cbl(b, f"enc{i + 1}.conv", f"enc{i + 1}.bn")}
        for j in range(n):
            e[f"res{j}"] = res(b, f"enc{i + 1}.residual_{j}")
        params[f"enc{i + 1}"] = e
    for j in range(5, 0, -1):
        cname = (
            f"dec{j}.upconv" if f"dec{j}.upconv.weight" in d else f"dec{j}.conv"
        )
        dd = {"conv": cbl(d, cname, f"dec{j}.bn",
                          transposed="upconv" in cname, bias=True)}
        dd["res0"] = res(d, f"dec{j}.residual")
        params[f"dec{j}"] = dd
    if head is not None:
        h = {k: np.asarray(v) for k, v in head.items()}
        key = "head.1.weight" if "head.1.weight" in h else "1.weight"
        params["head"] = {
            "kernel": np.transpose(h[key], (2, 3, 1, 0)),
            "bias": h[key.replace("weight", "bias")],
        }
    else:
        # FRID stops at the decoder — zero head keeps the tree complete
        cin = params["dec1"]["conv"]["bn"]["scale"].shape[0]
        params["head"] = {"kernel": np.zeros((3, 3, cin, 17), np.float32),
                          "bias": np.zeros((17,), np.float32)}
    return {"params": params}


def rangenet_frid_descriptor(logits: "jnp.ndarray", agg_type: str = "depth",
                             num_sectors: int = 16) -> "jnp.ndarray":
    """(B, H, W, C) decoder logits → FRID descriptor
    (``metrics/models/rangenet/model.py:349-368``: 'depth' = mean over
    16 row bands, 'sector' = 16 column bands, 'all' = global mean)."""
    B, H, W, C = logits.shape
    N = num_sectors
    if agg_type == "all":
        return logits.mean(axis=(1, 2))
    if agg_type == "sector":
        x = logits.reshape(B, H, N, W // N, C).mean(axis=(1, 3))  # (B, N, C)
    elif agg_type == "depth":
        x = logits.reshape(B, N, H // N, W, C).mean(axis=(2, 3))  # (B, N, C)
    else:
        raise NotImplementedError(agg_type)
    # torch flattens channel-major ((B, C, N) view); match that ordering
    return x.transpose(0, 2, 1).reshape(B, -1)
