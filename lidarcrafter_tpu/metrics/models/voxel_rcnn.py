"""pcdet VoxelRCNN-CenterHead: faithful eval-mode port + weight ingestion.

The reference's DCF metric runs an external OpenPCDet detector
(``voxelrcnn-center`` config + checkpoint, ``tools/evaluation/
extract_foreground_samples.py:20-25``; ``pcdet.models.build_network`` at
``lidargen/metrics/fg_object.py:23-26``).  The detector is NOT vendored in
the reference, so this module re-implements the pcdet module chain the
checkpoint names encode — MeanVFE → VoxelBackBone8x (spconv) →
HeightCompression → BaseBEVBackbone → CenterHead → VoxelRCNNHead (RoI
second stage, when the checkpoint carries one) — on our sparse-conv
primitives (``ops/sparse.py``), with :func:`~lidarcrafter_tpu.utils.
torch_ckpt.convert_voxel_rcnn` mapping released pcdet state_dicts onto it.
``predict`` applies pcdet's post-processing (class-agnostic greedy rotated
NMS + score threshold) before emitting the flat detection set.

Conventions follow pcdet: voxel coords are (z, y, x); BatchNorm eps=1e-3
(``nn.BatchNorm1d(eps=1e-3, momentum=0.01)`` throughout pcdet); all BNs run
frozen (eval mode).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ...ops.sparse import (
    sparse_conv3d_strided,
    submanifold_conv3d,
    voxelize_coords_mean,
)

_BN_EPS = 1e-3


def _bn(p, x):
    return (x - p["mean"]) / jnp.sqrt(p["var"] + _BN_EPS) * p["scale"] + p["bias"]


def _subm_block(p, f, coords, mask):
    """SubMConv3d(bias=False) + BN1d + ReLU (pcdet ``post_act_block`` subm)."""
    f = submanifold_conv3d(f, coords, mask, p["conv"]["kernel"])
    f = jax.nn.relu(_bn(p["bn"], f))
    return jnp.where(mask[:, None], f, 0.0)


def _spconv_block(
    p, f, coords, mask, *, kernel_size, stride, padding, max_voxels, in_spatial
):
    """SparseConv3d(stride, bias=False) + BN1d + ReLU.  ``in_spatial`` (the
    stage's input (Z, Y, X) dims) bounds the output sites to spconv's
    ``(in + 2p − k)//s + 1`` grid."""
    f, coords, mask = sparse_conv3d_strided(
        f, coords, mask, p["conv"]["kernel"],
        kernel_size=kernel_size, stride=stride, padding=padding,
        max_voxels=max_voxels, out_spatial=in_spatial,
    )
    f = jax.nn.relu(_bn(p["bn"], f))
    return jnp.where(mask[:, None], f, 0.0), coords, mask


def voxel_backbone_8x(
    p, feats, coords, mask, grid_zyx,
    max_voxels=(65536, 32768, 16384, 8192),
    return_levels: bool = False,
):
    """pcdet ``VoxelBackBone8x`` (spconv_backbone.py): conv_input + 4 stages +
    conv_out.  ``coords`` are (z, y, x); ``grid_zyx`` the base voxel grid dims
    (spconv sparse_shape) bounding every stage's output sites.  Returns the
    8x-downsampled level; with ``return_levels`` also the x_conv2/3/4
    intermediates (stride 2/4/8) the VoxelRCNN RoI head pools from."""
    f = _subm_block(p["conv_input"], feats, coords, mask)
    f = _subm_block(p["conv1"][0], f, coords, mask)

    stage_geom = [
        dict(kernel_size=(3, 3, 3), stride=(2, 2, 2), padding=(1, 1, 1)),
        dict(kernel_size=(3, 3, 3), stride=(2, 2, 2), padding=(1, 1, 1)),
        dict(kernel_size=(3, 3, 3), stride=(2, 2, 2), padding=(0, 1, 1)),
    ]
    stage_dims = [tuple(grid_zyx)] + [tuple(d) for d in level_grid_dims(grid_zyx)]
    levels = []
    for i, name in enumerate(("conv2", "conv3", "conv4")):
        blocks = p[name]
        f, coords, mask = _spconv_block(
            blocks[0], f, coords, mask, **stage_geom[i],
            max_voxels=max_voxels[i + 1], in_spatial=stage_dims[i],
        )
        for sub in blocks[1:]:
            f = _subm_block(sub, f, coords, mask)
        levels.append(
            {"feats": f, "coords": coords, "mask": mask, "stride": 2 ** (i + 1)}
        )

    # conv_out: kernel (3,1,1), stride (2,1,1), padding 0 — z-only downsample
    f, coords, mask = _spconv_block(
        p["conv_out"], f, coords, mask,
        kernel_size=(3, 1, 1), stride=(2, 1, 1), padding=(0, 0, 0),
        max_voxels=max_voxels[-1], in_spatial=stage_dims[3],
    )
    if return_levels:
        return f, coords, mask, levels
    return f, coords, mask


def height_compression(f, coords, mask, nz, ny, nx):
    """pcdet ``HeightCompression``: dense (z, y, x, C) → (y, x, z·C).
    Out-of-range coords are dropped (never clipped onto edge pixels)."""
    C = f.shape[-1]
    dense = jnp.zeros((nz, ny, nx, C), f.dtype)
    inb = (
        mask
        & (coords[:, 0] >= 0) & (coords[:, 0] < nz)
        & (coords[:, 1] >= 0) & (coords[:, 1] < ny)
        & (coords[:, 2] >= 0) & (coords[:, 2] < nx)
    )
    zi = jnp.where(inb, coords[:, 0], nz)
    dense = dense.at[zi, coords[:, 1], coords[:, 2]].add(
        jnp.where(inb[:, None], f, 0.0), mode="drop"
    )
    return jnp.transpose(dense, (1, 2, 0, 3)).reshape(ny, nx, nz * C)


def _conv2d(p, x, stride=1):
    # explicit symmetric padding k//2 (torch Conv2d/ZeroPad2d semantics —
    # XLA SAME places odd padding on the high side at stride 2, torch doesn't)
    kh, kw = p["kernel"].shape[0], p["kernel"].shape[1]
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    return jax.lax.conv_general_dilated(
        x[None], p["kernel"], (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + p.get("bias", 0.0)


def _conv2d_block(p, x, stride=1):
    return jax.nn.relu(_bn(p["bn"], _conv2d(p["conv"], x, stride)))


def bev_backbone(p, x):
    """pcdet ``BaseBEVBackbone``: per-block stacked 3x3 convs (first one
    strided) + per-block upsampling deblocks, channel-concatenated."""
    H0, W0 = x.shape[0], x.shape[1]
    ups = []
    h = x
    for blk, deblk in zip(p["blocks"], p["deblocks"]):
        h = _conv2d_block(blk[0], h, stride=blk[0]["stride"])
        for sub in blk[1:]:
            h = _conv2d_block(sub, h)
        if deblk["transpose"]:
            # ConvTranspose2d(k=s, stride=s): exact block scatter —
            # out[s·i+a, s·j+b, o] = Σ_c x[i,j,c] · W[c,o,a,b]
            Wt = deblk["conv"]["tkernel"]  # torch layout (in, out, kh, kw)
            s = deblk["stride"]
            u = jnp.einsum("hwc,coab->hawbo", h, Wt)
            u = u.reshape(h.shape[0] * s, h.shape[1] * s, Wt.shape[1])
        else:  # upsample stride 1 → plain 1x1 conv
            u = _conv2d(deblk["conv"], h)
        # odd input sizes: the transpose overshoots by up to one row/col
        ups.append(jax.nn.relu(_bn(deblk["bn"], u))[:H0, :W0])
    return jnp.concatenate(ups, axis=-1)


def _separate_head(p, x):
    """pcdet ``SeparateHead``: per-target Sequential of (conv+BN+ReLU)* +
    final conv (with bias)."""
    out = {}
    for name, layers in p.items():
        h = x
        for layer in layers[:-1]:
            h = _conv2d_block(layer, h)
        out[name] = _conv2d(layers[-1]["conv"], h)
    return out


def center_head(p, x):
    """pcdet ``CenterHead`` forward: shared conv + per-class-group separate
    heads.  Returns a list of per-group dicts of raw maps."""
    h = _conv2d_block(p["shared_conv"], x)
    return [_separate_head(hp, h) for hp in p["heads_list"]]


@partial(jax.jit, static_argnames=("k", "feature_map_stride"))
def decode_center_boxes(
    head_out: dict,
    point_range: jnp.ndarray,
    voxel_size: jnp.ndarray,
    k: int = 128,
    feature_map_stride: int = 8,
):
    """CenterPoint decoding (pcdet ``decode_bbox_from_heatmap``): top-k of the
    sigmoid heatmap; centers = (grid + offset)·stride·voxel + range;
    sizes = exp(dim); yaw = atan2(rot_sin, rot_cos)."""
    hm = jax.nn.sigmoid(head_out["hm"])  # (H, W, ncls)
    H, W, ncls = hm.shape
    flat = hm.reshape(-1)
    scores, idx = jax.lax.top_k(flat, k)
    cls = (idx % ncls).astype(jnp.int32)
    pix = idx // ncls
    ys = (pix // W).astype(jnp.float32)
    xs = (pix % W).astype(jnp.float32)

    def at(name, d):
        return head_out[name].reshape(-1, d)[pix]

    center = at("center", 2)
    xs = (xs + center[:, 0]) * feature_map_stride * voxel_size[0] + point_range[0]
    ys = (ys + center[:, 1]) * feature_map_stride * voxel_size[1] + point_range[1]
    zs = at("center_z", 1)[:, 0]
    dim = jnp.exp(at("dim", 3))
    rot = at("rot", 2)
    yaw = jnp.arctan2(rot[:, 0], rot[:, 1])
    boxes = jnp.stack([xs, ys, zs, dim[:, 0], dim[:, 1], dim[:, 2], yaw], axis=1)
    return boxes, scores, cls


@dataclasses.dataclass
class VoxelRCNNCenterHead:
    """Eval-mode detector over a padded single cloud.

    ``params``: output of ``convert_voxel_rcnn``; ``class_groups``: class
    names per CenterHead group (pcdet CLASS_NAMES_EACH_HEAD order).
    """

    params: Any
    class_groups: Sequence[Sequence[str]]
    point_range: Sequence[float] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    voxel_size: Sequence[float] = (0.075, 0.075, 0.2)
    max_voxels: int = 65536
    topk_per_head: int = 128
    score_thresh: float = 0.1
    # pcdet POST_PROCESSING.NMS_CONFIG (class-agnostic rotated NMS; the
    # nuScenes CenterPoint/VoxelRCNN configs use THRESH 0.2, PRE 1000, POST 83)
    nms_thresh: float = 0.2
    nms_post_maxsize: int = 83

    @property
    def grid_zyx(self):
        pr, vs = self.point_range, self.voxel_size
        nx = int(round((pr[3] - pr[0]) / vs[0]))
        ny = int(round((pr[4] - pr[1]) / vs[1]))
        nz = int(round((pr[5] - pr[2]) / vs[2]))
        return nz, ny, nx

    def _bev_zyx(self):
        nz, ny, nx = self.grid_zyx

        def down(v, k, s, p):
            return (v + 2 * p - k) // s + 1

        for geom in ((3, 2, 1), (3, 2, 1)):
            nz, ny, nx = (down(v, *geom) for v in (nz, ny, nx))
        nz = down(nz, 3, 2, 0)
        ny, nx = down(ny, 3, 2, 1), down(nx, 3, 2, 1)
        nz = down(nz, 3, 2, 0)  # conv_out, z only
        return nz, ny, nx

    def forward(self, points: jnp.ndarray, point_mask: jnp.ndarray):
        """points (N, 3+F) → (per-group [(boxes (k,7), scores, labels)],
        sparse backbone levels for the RoI second stage)."""
        pr = jnp.asarray(self.point_range)
        inr = (
            point_mask
            & jnp.all(points[:, :3] >= pr[:3], -1)
            & jnp.all(points[:, :3] < pr[3:] - 1e-3, -1)
        )
        vs = jnp.asarray(self.voxel_size)
        # pcdet voxel coords are (z, y, x), anchored at the range minimum
        cell = jnp.floor((points[:, :3] - pr[:3]) / vs).astype(jnp.int32)
        zyx = jnp.stack([cell[:, 2], cell[:, 1], cell[:, 0]], axis=1)
        # MeanVFE: mean of raw point features per voxel
        vox_feats, coords, vmask = voxelize_coords_mean(
            zyx, points, inr, max_voxels=self.max_voxels
        )
        f, c, m, levels = voxel_backbone_8x(
            self.params["backbone_3d"], vox_feats, coords, vmask, self.grid_zyx,
            return_levels=True,
        )
        nz, ny, nx = self._bev_zyx()
        bev = height_compression(f, c, m, nz, ny, nx)
        h = bev_backbone(self.params["backbone_2d"], bev)
        heads = center_head(self.params["dense_head"], h)

        out = []
        voxel_xy = jnp.asarray(self.voxel_size[:2])
        for g, head_out in enumerate(heads):
            boxes, scores, cls = decode_center_boxes(
                head_out, pr, voxel_xy, k=self.topk_per_head
            )
            out.append((boxes, scores, cls))
        return out, levels

    def __call__(self, points: jnp.ndarray, point_mask: jnp.ndarray):
        """points (N, 3+F) → list of per-group (boxes (k,7), scores, labels)
        (raw CenterHead top-k proposals, no post-processing)."""
        return self.forward(points, point_mask)[0]

    def predict(self, points, point_mask):
        """Flat detections: (boxes (K,7), scores, class names list, valid).

        With a ``roi_head`` in the checkpoint, the flat CenterHead proposal
        set is refined/rescored ONCE by the VoxelRCNN second stage.  pcdet
        ``Detector3DTemplate.post_processing`` then runs class-agnostic
        greedy rotated NMS (NMS_CONFIG) and the final score threshold;
        ``valid`` encodes both, so ``boxes[valid]`` matches the reference's
        deduplicated detection set (``extract_foreground_samples.py:54-121``).
        """
        from ...ops.iou3d import nms

        per_head, levels = self.forward(points, point_mask)
        boxes = jnp.concatenate([b for b, _, _ in per_head], axis=0)
        scores = jnp.concatenate([s for _, s, _ in per_head], axis=0)
        if "roi_head" in self.params:
            boxes, scores = voxel_rcnn_roi_head(
                self.params["roi_head"], boxes,
                jnp.ones((boxes.shape[0],), bool), levels,
                self.point_range, self.voxel_size, self.grid_zyx,
            )
        order, keep = nms(boxes, scores, self.nms_thresh)
        keep &= jnp.cumsum(keep) <= self.nms_post_maxsize  # NMS_POST_MAXSIZE
        nms_keep = jnp.zeros((boxes.shape[0],), bool).at[order].set(keep)
        names = []
        for g, (_, _, c) in enumerate(per_head):
            group = list(self.class_groups[g])
            names.extend([group[int(ci)] for ci in np.asarray(c)])
        valid = nms_keep & (scores >= self.score_thresh)
        return boxes, scores, names, valid


# nuScenes CenterHead class grouping (pcdet CLASS_NAMES_EACH_HEAD convention)
NUSC_CLASS_GROUPS = (
    ("car",),
    ("truck", "construction_vehicle"),
    ("bus", "trailer"),
    ("barrier",),
    ("motorcycle", "bicycle"),
    ("pedestrian", "traffic_cone"),
)


def load_voxel_rcnn_from_pcdet(ckpt_path, class_groups=NUSC_CLASS_GROUPS, **kwargs):
    """Build a :class:`VoxelRCNNCenterHead` from a released pcdet checkpoint
    (the reference's ``--pretrained_model`` at
    ``extract_foreground_samples.py:25``).  Accepts pcdet's
    ``{'model_state': ...}`` wrapper or a plain state_dict."""
    import torch

    from ...utils.torch_ckpt import convert_voxel_rcnn

    obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    for key in ("model_state", "state_dict", "net"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    sd = {k: v.numpy() for k, v in obj.items()}
    n_heads = len({k.split(".")[2] for k in sd if k.startswith("dense_head.heads_list.")})
    if n_heads and n_heads != len(class_groups):
        class_groups = class_groups[:n_heads]
    return VoxelRCNNCenterHead(
        params=convert_voxel_rcnn(sd), class_groups=class_groups, **kwargs
    )


# -------------------------------------------------------- RoI refinement head


def roi_grid_points(rois: jnp.ndarray, grid_size: int = 6) -> jnp.ndarray:
    """(N, 7) rois → (N, G³, 3) global grid points; pcdet
    ``VoxelRCNNHead.get_global_grid_points_of_roi`` /
    ``get_dense_grid_points``: dense (idx+0.5)/G local grid scaled by box
    size, centered, rotated by yaw, translated to the box center."""
    G = grid_size
    idx = jnp.stack(
        jnp.meshgrid(jnp.arange(G), jnp.arange(G), jnp.arange(G), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3).astype(jnp.float32)  # (G³, [x,y,z] order like pcdet)
    local = (idx + 0.5) / G * rois[:, None, 3:6] - rois[:, None, 3:6] / 2
    cos, sin = jnp.cos(rois[:, 6]), jnp.sin(rois[:, 6])
    x = local[..., 0] * cos[:, None] - local[..., 1] * sin[:, None]
    y = local[..., 0] * sin[:, None] + local[..., 1] * cos[:, None]
    rot = jnp.stack([x, y, local[..., 2]], axis=-1)
    return rot + rois[:, None, :3]


def dense_point_index_grid(coords_zyx, mask, nz, ny, nx):
    """(V, 3) zyx coords → (1, Z, Y, X) int32 grid of voxel row indices
    (−1 = empty); pcdet ``common_utils.generate_voxel2pinds``.  Out-of-range
    coords are dropped, not clipped onto edge cells."""
    grid = jnp.full((nz, ny, nx), -1, jnp.int32)
    inb = (
        mask
        & (coords_zyx[:, 0] >= 0) & (coords_zyx[:, 0] < nz)
        & (coords_zyx[:, 1] >= 0) & (coords_zyx[:, 1] < ny)
        & (coords_zyx[:, 2] >= 0) & (coords_zyx[:, 2] < nx)
    )
    zi = jnp.where(inb, coords_zyx[:, 0], nz)
    idx = jnp.arange(coords_zyx.shape[0], dtype=jnp.int32)
    return grid.at[zi, coords_zyx[:, 1], coords_zyx[:, 2]].set(idx, mode="drop")[None]


def _neighbor_pool(p, level, grid_xyz, grid_coords_bxyz, grid_mask,
                   point_range, voxel_size, query_range, radius, nsample):
    """One NeighborVoxelSAModuleMSG scale (``voxel_pool_modules.py:8-130``):
    mlp_in(features) → voxel query/group → +pos mlp → relu → max pool →
    mlp_out.  BN eps 1e-5 (torch default in that module)."""
    from ...ops.stack import voxel_query

    feats, coords, vmask = level["feats"], level["coords"], level["mask"]
    stride = level["stride"]
    vs = np.asarray(voxel_size) * stride
    # voxel centers in world (get_voxel_centers; coords are zyx)
    centers = (
        coords[:, ::-1].astype(jnp.float32) + 0.5
    ) * jnp.asarray(vs) + jnp.asarray(point_range[:3])

    def bn5(pp, x):
        return (x - pp["mean"]) / jnp.sqrt(pp["var"] + 1e-5) * pp["scale"] + pp["bias"]

    f_in = feats @ p["mlp_in"]["conv"]["kernel"]
    f_in = bn5(p["mlp_in"]["bn"], f_in)
    f_in = jnp.where(vmask[:, None], f_in, 0.0)

    nz, ny, nx = level["grid_zyx"]
    pind = dense_point_index_grid(coords, vmask, nz, ny, nx)
    # reference reorders new_coords (b,x,y,z) → (b,z,y,x) (forward:84)
    coords_bzyx = grid_coords_bxyz[:, jnp.array([0, 3, 2, 1])]
    idx, empty = voxel_query(
        coords_bzyx, grid_xyz, centers, pind,
        query_range=query_range, radius=radius, nsample=nsample,
        new_mask=grid_mask,
    )
    keep = (~empty & grid_mask)[:, None, None]
    grouped = jnp.where(keep, f_in[idx], 0.0)
    gxyz = jnp.where(keep, centers[idx] - grid_xyz[:, None, :], 0.0)
    pos = bn5(p["mlp_pos"]["bn"], gxyz @ p["mlp_pos"]["conv"]["kernel"])
    h = jax.nn.relu(grouped + pos)
    h = jnp.max(h, axis=1)
    h = bn5(p["mlp_out"]["bn"], h @ p["mlp_out"]["conv"]["kernel"])
    return jnp.where(grid_mask[:, None], jax.nn.relu(h), 0.0)


def _fc_stack(p, x):
    """[Linear(no bias) + BN1d + ReLU]×n; pcdet ``make_fc_layers``
    (BN eps 1e-5 torch default)."""
    for layer in p:
        x = x @ layer["conv"]["kernel"]
        x = (x - layer["bn"]["mean"]) / jnp.sqrt(layer["bn"]["var"] + 1e-5) \
            * layer["bn"]["scale"] + layer["bn"]["bias"]
        x = jax.nn.relu(x)
    return x


def level_grid_dims(base_grid_zyx):
    """Per-level (Z, Y, X) dims for x_conv2/3/4, following VoxelBackBone8x's
    conv arithmetic (k3 s2 p1 twice; conv4 has z padding 0)."""

    def down(v, k, s, p):
        return (v + 2 * p - k) // s + 1

    nz, ny, nx = base_grid_zyx
    dims = []
    nz, ny, nx = down(nz, 3, 2, 1), down(ny, 3, 2, 1), down(nx, 3, 2, 1)
    dims.append((nz, ny, nx))
    nz, ny, nx = down(nz, 3, 2, 1), down(ny, 3, 2, 1), down(nx, 3, 2, 1)
    dims.append((nz, ny, nx))
    nz, ny, nx = down(nz, 3, 2, 0), down(ny, 3, 2, 1), down(nx, 3, 2, 1)
    dims.append((nz, ny, nx))
    return dims


def voxel_rcnn_roi_head(
    p,
    rois: jnp.ndarray,
    roi_mask: jnp.ndarray,
    levels: list,
    point_range,
    voxel_size,
    base_grid_zyx,
    grid_size: int = 6,
    query_ranges=((4, 4, 4), (4, 4, 4), (4, 4, 4)),
    radii=(0.4, 0.8, 1.6),
    nsamples=(16, 16, 16),
):
    """pcdet ``VoxelRCNNHead`` second stage: 6³ RoI grid pooling from the
    x_conv2/3/4 sparse levels → shared FC → class-agnostic confidence +
    box residual refinement (decoded in the RoI's local frame,
    ``roi_head_template.generate_predicted_boxes``).

    Returns (refined_boxes (N, 7), roi_scores (N,) sigmoid confidence).
    """
    from .detector import decode_boxes

    N = rois.shape[0]
    G3 = grid_size**3
    grid_xyz = roi_grid_points(rois, grid_size).reshape(-1, 3)  # (N·G³, 3)
    grid_mask = jnp.repeat(roi_mask, G3)

    dims = level_grid_dims(base_grid_zyx)
    pooled = []
    for k, level in enumerate(levels):
        level = dict(level, grid_zyx=dims[k])
        vs = np.asarray(voxel_size) * level["stride"]
        cell = jnp.floor(
            (grid_xyz - jnp.asarray(point_range[:3])) / jnp.asarray(vs)
        ).astype(jnp.int32)
        # new_coords in the reference's (b, x, y, z) order (forward:84)
        coords_bxyz = jnp.concatenate(
            [jnp.zeros((grid_xyz.shape[0], 1), jnp.int32), cell], axis=1
        )
        pooled.append(
            _neighbor_pool(
                p["roi_grid_pool_layers"][k], level, grid_xyz, coords_bxyz,
                grid_mask, point_range, voxel_size,
                tuple(query_ranges[k]), float(radii[k]), int(nsamples[k]),
            )
        )
    pooled = jnp.concatenate(pooled, axis=-1).reshape(N, -1)  # (N, G³·ΣC)

    shared = _fc_stack(p["shared_fc_layer"], pooled)
    cls_feat = _fc_stack(p["cls_fc_layers"], shared)
    rcnn_cls = cls_feat @ p["cls_pred_layer"]["kernel"] + p["cls_pred_layer"]["bias"]
    reg_feat = _fc_stack(p["reg_fc_layers"], shared)
    rcnn_reg = reg_feat @ p["reg_pred_layer"]["kernel"] + p["reg_pred_layer"]["bias"]

    # decode in the RoI local frame: anchors = rois with zero center/heading
    local_rois = rois.at[:, 0:3].set(0.0).at[:, 6].set(0.0)
    boxes_local = decode_boxes(rcnn_reg[:, :7], local_rois)
    cos, sin = jnp.cos(rois[:, 6]), jnp.sin(rois[:, 6])
    x = boxes_local[:, 0] * cos - boxes_local[:, 1] * sin
    y = boxes_local[:, 0] * sin + boxes_local[:, 1] * cos
    center = jnp.stack([x, y, boxes_local[:, 2]], axis=1) + rois[:, :3]
    heading = boxes_local[:, 6] + rois[:, 6]
    refined = jnp.concatenate(
        [center, boxes_local[:, 3:6], heading[:, None]], axis=1
    )
    return refined, jax.nn.sigmoid(rcnn_cls[:, 0])
