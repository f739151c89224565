"""Sparse 3D UNet feature extractors: MinkowskiNet (FSVD) and SPVCNN (FPVD).

TPU-native re-design of the reference's torchsparse eval backbones
(``lidargen/metrics/models/minkowskinet/model.py:13-141``,
``lidargen/metrics/models/spvcnn/model.py:14-179``,
``lidargen/metrics/models/ts/basic_blocks.py:16-78``): voxels live in a
static padded (V, C) table with int coords + validity mask, neighbor lookup
is a binary search over sorted coordinate keys, and every kernel tap is one
gathered (V, Cin) x (Cin, Cout) MXU matmul (see ``ops/sparse.py``).

Frozen-BatchNorm eval-mode extractors (these back the Frechet Sparse Volume
Distance / Frechet Point-based Volume Distance metrics); dropout layers of
the reference are inference no-ops and omitted.  Weight layout matches
torchsparse v1.4 (kernel ``(k^3, Cin, Cout)``; 1x1 convs are plain Dense)
so pretrained checkpoints convert tap-for-tap.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.sparse import (
    point_to_voxel_mean,
    sparse_downsample2,
    sparse_upsample2,
    submanifold_conv3d,
    voxel_to_point_trilinear,
    voxelize,
    voxelize_mean,
)
from .pointnet import FrozenBN

_KINIT = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")

# torchsparse layer_num with cr=0.5 → 16-sector depth aggregation of the
# final 48-dim features gives the reference's 768-dim eval descriptor.
DEFAULT_LAYERS = (32, 32, 64, 128, 256, 256, 128, 96, 96)


class SubMConv3(nn.Module):
    """3^3 submanifold sparse conv (torchsparse Conv3d ks=3 s=1, no bias)."""

    out_ch: int

    @nn.compact
    def __call__(self, feats, coords, mask):
        k = self.param("kernel", _KINIT, (27, feats.shape[-1], self.out_ch))
        return submanifold_conv3d(feats, coords, mask, k)


class SparseConvBlock(nn.Module):
    """Downsampling block: 2^3 stride-2 conv + BN + ReLU
    (``basic_blocks.BasicConvolutionBlock``, ks=2 usage)."""

    out_ch: int

    @nn.compact
    def __call__(self, feats, coords, mask):
        k = self.param("kernel", _KINIT, (8, feats.shape[-1], self.out_ch))
        out, oc, om = sparse_downsample2(
            feats, coords, mask, k, max_voxels=feats.shape[0]
        )
        out = nn.relu(FrozenBN()(out))
        return jnp.where(om[:, None], out, 0.0), oc, om


class SparseDeconvBlock(nn.Module):
    """Upsampling block: 2^3 stride-2 transposed conv + BN + ReLU
    (``basic_blocks.BasicDeconvolutionBlock``)."""

    out_ch: int

    @nn.compact
    def __call__(self, feats, coords, mask, fine_coords, fine_mask):
        k = self.param("kernel", _KINIT, (8, feats.shape[-1], self.out_ch))
        out = sparse_upsample2(feats, coords, mask, fine_coords, fine_mask, k)
        out = nn.relu(FrozenBN()(out))
        return jnp.where(fine_mask[:, None], out, 0.0)


class SparseResBlock(nn.Module):
    """conv3-BN-ReLU-conv3-BN + (1x1 conv-BN shortcut on channel change),
    final ReLU (``basic_blocks.ResidualBlock:50-78``)."""

    out_ch: int

    @nn.compact
    def __call__(self, feats, coords, mask):
        h = SubMConv3(self.out_ch)(feats, coords, mask)
        h = nn.relu(FrozenBN()(h))
        h = SubMConv3(self.out_ch)(h, coords, mask)
        h = FrozenBN()(h)
        if feats.shape[-1] != self.out_ch:
            sc = nn.Dense(self.out_ch, use_bias=False, kernel_init=_KINIT)(feats)
            sc = FrozenBN()(sc)
        else:
            sc = feats
        return jnp.where(mask[:, None], nn.relu(h + sc), 0.0)


class _SparseUNetBase(nn.Module):
    """Shared stem / 4-down / 4-up scaffolding."""

    layer_num: Sequence[int] = DEFAULT_LAYERS
    cr: float = 0.5
    input_dims: int = 4
    num_classes: int = 17
    voxel_size: float = 0.05
    max_voxels: int = 32768

    @property
    def cs(self):
        return [int(self.cr * x) for x in self.layer_num]

    def stem(self, feats, coords, mask):
        cs = self.cs
        f = nn.relu(FrozenBN(name="stem_bn1")(
            SubMConv3(cs[0], name="stem_conv1")(feats, coords, mask)))
        f = nn.relu(FrozenBN(name="stem_bn2")(
            SubMConv3(cs[0], name="stem_conv2")(f, coords, mask)))
        return jnp.where(mask[:, None], f, 0.0)

    def encoder(self, f0, c0, m0):
        """stage1..4: down + 2 residual blocks each; returns per-level."""
        cs = self.cs
        levels = [(f0, c0, m0)]
        f, c, m = f0, c0, m0
        for k in range(1, 5):
            f, c, m = SparseConvBlock(cs[k - 1], name=f"down{k}")(f, c, m)
            f = SparseResBlock(cs[k], name=f"stage{k}_res1")(f, c, m)
            f = SparseResBlock(cs[k], name=f"stage{k}_res2")(f, c, m)
            levels.append((f, c, m))
        return levels

    def decoder_step(self, j, f, c, m, skip):
        """up-j: deconv to the skip's sites, concat, 2 residual blocks."""
        cs = self.cs
        sf, sc_, sm = skip
        up = SparseDeconvBlock(cs[4 + j], name=f"up{j}_deconv")(f, c, m, sc_, sm)
        h = jnp.concatenate([up, sf], axis=-1)
        h = SparseResBlock(cs[4 + j], name=f"up{j}_res1")(h, sc_, sm)
        h = SparseResBlock(cs[4 + j], name=f"up{j}_res2")(h, sc_, sm)
        return h, sc_, sm


class MinkowskiNet(_SparseUNetBase):
    """Voxel-modality extractor (FSVD backbone);
    cf. ``minkowskinet/model.py:99-141`` forward.

    ``__call__(points, feats, point_mask)`` voxelizes internally
    (first-point-wins, torchsparse ``sparse_quantize`` semantics) and returns
    a dict: ``logits`` (V, cs[8]) final per-voxel features, ``coords`` the
    level-0 int voxel coords, ``mask`` voxel validity, plus ``bottleneck``
    (V, cs[4]) for the ``return_logits=True`` path.
    """

    @nn.compact
    def __call__(self, points, feats, point_mask):
        coords, src, vmask, _ = voxelize(
            points, self.voxel_size, point_mask=point_mask,
            max_voxels=self.max_voxels,
        )
        vfeats = jnp.where(vmask[:, None], feats[src], 0.0)

        f0 = self.stem(vfeats, coords, vmask)
        levels = self.encoder(f0, coords, vmask)
        f, c, m = levels[4]
        bottleneck = f
        for j in range(1, 5):
            f, c, m = self.decoder_step(j, f, c, m, levels[4 - j])
        out = nn.Dense(self.num_classes, name="classifier")(f)
        return {
            "logits": f,
            "output": jnp.where(m[:, None], out, 0.0),
            "coords": c,
            "mask": m,
            "bottleneck": bottleneck,
            "bottleneck_coords": levels[4][1],
            "bottleneck_mask": levels[4][2],
        }


class SPVCNN(_SparseUNetBase):
    """Point-voxel extractor (FPVD backbone); cf. ``spvcnn/model.py:118-179``.

    Interleaves the sparse UNet with a point branch: trilinear devoxelize
    (``voxel_to_point``) after the stem / bottleneck / mid-decoder / end,
    with per-point residual MLP transforms, re-voxelizing by mean
    (``point_to_voxel``) before each conv stage.  Returns per-POINT features.
    """

    @nn.compact
    def __call__(self, points, feats, point_mask):
        cs = self.cs
        vf, vc, vm, pts_vox, _ = voxelize_mean(
            points, feats, self.voxel_size, point_mask=point_mask,
            max_voxels=self.max_voxels,
        )

        x0 = self.stem(vf, vc, vm)
        z0 = voxel_to_point_trilinear(x0, vc, vm, pts_vox, point_mask, level=0)

        x1 = point_to_voxel_mean(z0, pts_vox, point_mask, vc, vm, level=0)
        levels = self.encoder(x1, vc, vm)
        f4, c4, m4 = levels[4]

        z1 = voxel_to_point_trilinear(f4, c4, m4, pts_vox, point_mask, level=4)
        pt0 = nn.relu(FrozenBN(name="pt0_bn")(
            nn.Dense(cs[4], name="pt0_dense")(z0)))
        z1 = z1 + pt0 * point_mask[:, None]

        f = point_to_voxel_mean(z1, pts_vox, point_mask, c4, m4, level=4)
        f, c, m = self.decoder_step(1, f, c4, m4, levels[3])
        f, c, m = self.decoder_step(2, f, c, m, levels[2])

        z2 = voxel_to_point_trilinear(f, c, m, pts_vox, point_mask, level=2)
        pt1 = nn.relu(FrozenBN(name="pt1_bn")(
            nn.Dense(cs[6], name="pt1_dense")(z1)))
        z2 = z2 + pt1 * point_mask[:, None]

        f = point_to_voxel_mean(z2, pts_vox, point_mask, c, m, level=2)
        f, c, m = self.decoder_step(3, f, c, m, levels[1])
        # up4's skip is the STEM output x0, not the re-voxelized point
        # features the encoder started from (``spvcnn/model.py:163-165``)
        f, c, m = self.decoder_step(4, f, c, m, (x0, vc, vm))

        z3 = voxel_to_point_trilinear(f, c, m, pts_vox, point_mask, level=0)
        pt2 = nn.relu(FrozenBN(name="pt2_bn")(
            nn.Dense(cs[8], name="pt2_dense")(z2)))
        z3 = z3 + pt2 * point_mask[:, None]

        out = nn.Dense(self.num_classes, name="classifier")(z3)
        return {
            "logits": jnp.where(point_mask[:, None], z3, 0.0),
            "output": jnp.where(point_mask[:, None], out, 0.0),
            "coords": pts_vox,
            "mask": point_mask,
        }


def _tap_perm(k: int):
    """Kernel-tap reordering torchsparse v1.4 → ours (ij-meshgrid, z-fastest).

    torchsparse's ``get_kernel_offsets`` enumeration is parity-dependent:
    ODD kernels are x-fastest (the MinkowskiEngine-compatible weight layout),
    EVEN kernels are z-fastest — pinned by ``calc_ti_weights``, whose corner
    weights w0..w7 are ordered with z as the LSB and must align row-for-row
    with ``get_kernel_offsets(2, ...)`` for its trilinear devoxelize to be
    correct.  Even kernels therefore match our order exactly (identity);
    odd kernels need the x<->z swap.  Returns ``perm`` with
    ``ours[i] = torch[perm[i]]``."""
    import numpy as np

    if k % 2 == 0:
        return np.arange(k**3)
    perm = []
    for x in range(k):
        for y in range(k):
            for z in range(k):
                perm.append((z * k + y) * k + x)
    return np.asarray(perm)


def convert_torchsparse_state_dict(sd: dict) -> dict:
    """torchsparse v1.4 MinkowskiNet/SPVCNN ``state_dict`` → flax params for
    :class:`MinkowskiNet` / :class:`SPVCNN` (pretrained eval checkpoints,
    ``lidargen/metrics/__init__.py:39-63`` ``build_model``).

    torchsparse kernels are already ``(k^3, Cin, Cout)`` (``(Cin, Cout)`` for
    1x1) — only the tap enumeration order differs; Linear weights transpose.
    """
    import numpy as np

    sd = {k: np.asarray(v) for k, v in sd.items()}
    p3, p2 = _tap_perm(3), _tap_perm(2)

    def bn(prefix):
        return {
            "scale": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"],
        }

    def conv(name, perm):
        return sd[name][perm]

    def resblock(prefix):
        out = {
            "SubMConv3_0": {"kernel": conv(f"{prefix}.net.0.weight", p3)},
            "FrozenBN_0": bn(f"{prefix}.net.1"),
            "SubMConv3_1": {"kernel": conv(f"{prefix}.net.3.weight", p3)},
            "FrozenBN_1": bn(f"{prefix}.net.4"),
        }
        if f"{prefix}.downsample.0.weight" in sd:
            out["Dense_0"] = {"kernel": sd[f"{prefix}.downsample.0.weight"]}
            out["FrozenBN_2"] = bn(f"{prefix}.downsample.1")
        return out

    params = {
        "stem_conv1": {"kernel": conv("stem.0.weight", p3)},
        "stem_bn1": bn("stem.1"),
        "stem_conv2": {"kernel": conv("stem.3.weight", p3)},
        "stem_bn2": bn("stem.4"),
        "classifier": {
            "kernel": sd["classifier.0.weight"].T,
            "bias": sd["classifier.0.bias"],
        },
    }
    for k in range(1, 5):
        params[f"down{k}"] = {
            "kernel": conv(f"stage{k}.0.net.0.weight", p2),
            "FrozenBN_0": bn(f"stage{k}.0.net.1"),
        }
        params[f"stage{k}_res1"] = resblock(f"stage{k}.1")
        params[f"stage{k}_res2"] = resblock(f"stage{k}.2")
    for j in range(1, 5):
        params[f"up{j}_deconv"] = {
            "kernel": conv(f"up{j}.0.net.0.weight", p2),
            "FrozenBN_0": bn(f"up{j}.0.net.1"),
        }
        params[f"up{j}_res1"] = resblock(f"up{j}.1.0")
        params[f"up{j}_res2"] = resblock(f"up{j}.1.1")
    for i in range(3):  # SPVCNN point branch
        if f"point_transforms.{i}.0.weight" in sd:
            params[f"pt{i}_dense"] = {
                "kernel": sd[f"point_transforms.{i}.0.weight"].T,
                "bias": sd[f"point_transforms.{i}.0.bias"],
            }
            params[f"pt{i}_bn"] = bn(f"point_transforms.{i}.1")
    return {"params": params}


def make_sparse_descriptor_fn(
    model,
    params,
    agg_type: str = "depth",
    depth_range: tuple = (1.0, 45.0),
):
    """Bind ``(points, feats, mask) -> (16*C,)`` eval descriptor (jitted).

    Points are shifted by half a voxel before the model's internal floor
    quantization to reproduce the reference's ``round(pcd / voxel_size)``
    (``metric_utils.py:158``).  Use with ``EvaluationEngine(voxel_apply=...)``
    (FSVD) or ``point_voxel_apply=...`` (FPVD).
    """
    import jax

    @jax.jit
    def describe(points, feats, mask):
        out = model.apply(params, points + 0.5 * model.voxel_size, feats, mask)
        return aggregate_sectors(
            out["logits"], out["coords"], out["mask"],
            agg_type=agg_type, depth_range=depth_range,
            voxel_size=model.voxel_size,
        )

    return describe


def aggregate_sectors(
    logits: jnp.ndarray,
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    agg_type: str = "depth",
    depth_range: tuple = (1.0, 45.0),
    voxel_size: float = 0.05,
    num_sectors: int = 16,
) -> jnp.ndarray:
    """Per-cloud descriptor: masked sector means of per-site features
    (``metric_utils.py:325-372`` ``batch2list``) → (num_sectors * C,).

    ``depth``: 16 radial shells of ``|coords - mean| * voxel_size`` between
    ``depth_range[0]+3`` and ``depth_range[1]`` (first shell open at 0);
    ``sector``: 16 azimuth wedges; ``all``: plain masked mean (C,).
    Empty sectors contribute zeros (the reference's nan_to_num).
    """
    import numpy as np

    fmask = mask.astype(logits.dtype)
    c = coords.astype(logits.dtype)
    center = jnp.sum(c * fmask[:, None], 0) / jnp.maximum(fmask.sum(), 1.0)
    c = c - center

    if agg_type == "all":
        return jnp.sum(logits * fmask[:, None], 0) / jnp.maximum(fmask.sum(), 1.0)
    if agg_type == "sector":
        key = jnp.arctan2(c[:, 1], c[:, 0])
        edges = np.linspace(-np.pi - 1e-4, np.pi + 1e-4, num_sectors + 1)
    elif agg_type == "depth":
        key = jnp.linalg.norm(c, axis=-1) * voxel_size
        edges = np.linspace(depth_range[0] + 3, depth_range[1], num_sectors + 1)
        edges[0] = 0.0
    else:
        raise NotImplementedError(agg_type)

    chunks = []
    for i in range(num_sectors):
        sel = fmask * (key >= edges[i]) * (key < edges[i + 1])
        n = jnp.maximum(sel.sum(), 1.0)
        chunks.append(jnp.sum(logits * sel[:, None], 0) / n)
    return jnp.concatenate(chunks)
