"""Metric-suite orchestration; cf. ``lidargen/metrics/eval_utils.py:18-136``.

``evaluate(reference, samples, metrics, data)`` dispatches over the same
metric names the reference supports.  Scene-distribution metrics that need
perceptual backbones (frid/fsvd/fpvd) either accept precomputed logits via
the ``features`` argument or extract them with the native backbones
(``metrics/extractor/``: rangenet, sparse_unet) via the ``pretrained-root``
loaders below; cd/emd/jsd/mmd run fully on-device from raw point lists.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.chamfer import chamfer_metric
from ..ops.emd import emd_metric
from . import OUTPUT_TEMPLATE
from .bev import bev_occupancy_grid, jensen_shannon_distance
from .distribution import compute_frechet_distance, compute_squared_mmd


def compute_cd(reference, samples) -> float:
    """Pairwise CD over aligned sample lists; cf. ``eval_utils.py:40-52``."""
    vals = [
        float(chamfer_metric(jnp.asarray(x)[None], jnp.asarray(y)[None]))
        for x, y in zip(reference, samples)
    ]
    return float(np.mean(vals))


def compute_emd(reference, samples) -> float:
    """cf. ``eval_utils.py:54-66``."""
    vals = [
        float(emd_metric(jnp.asarray(x)[None], jnp.asarray(y)[None]))
        for x, y in zip(reference, samples)
    ]
    return float(np.mean(vals))


def compute_jsd(reference, samples, data: str = "32") -> float:
    """cf. ``eval_utils.py:85-95``: JSD between summed BEV occupancy grids."""
    ref = sum(bev_occupancy_grid(jnp.asarray(p)[:, :3], data_type=data) for p in reference)
    gen = sum(bev_occupancy_grid(jnp.asarray(p)[:, :3], data_type=data) for p in samples)
    return float(jensen_shannon_distance(ref.reshape(-1), gen.reshape(-1)))


def compute_mmd(reference, samples, data: str = "32") -> float:
    """Minimum matching distance over BEV-deduped clouds; cf.
    ``eval_utils.py:68-83``.  O(|ref|·|gen|) chamfer evaluations."""
    vals = []
    for r in reference:
        rj = jnp.asarray(r)[None, :, :2]
        dists = [
            float(chamfer_metric(rj, jnp.asarray(s)[None, :, :2])) for s in samples
        ]
        vals.append(min(dists))
    return float(np.mean(vals))


def compute_fd(reference_feats, sample_feats) -> float:
    """cf. ``eval_utils.py:98-102``."""
    return compute_frechet_distance(reference_feats, sample_feats)


_TYPE2DATASET = {"32": "nuscenes", "64": "kitti"}
_DEPTH_RANGE = {"nuscenes": (1.0, 45.0), "kitti": (1.0, 56.0)}
_EVAL_VOXEL_SIZE = 0.05  # cf. ``metrics/__init__.py:28`` VOXEL_SIZE


def _load_sparse_backbone(model_name: str, folder, max_points: int):
    """Load a pretrained torchsparse eval checkpoint
    (``{root}/{dataset}/{minkowskinet|spvcnn}/model.ckpt``, cf.
    ``metrics/__init__.py:39-63`` ``build_model``) into the flax backbone.
    Channel widths / class count are inferred from the weight shapes."""
    from pathlib import Path

    import torch

    from .extractor.sparse_unet import (
        SPVCNN,
        MinkowskiNet,
        convert_torchsparse_state_dict,
    )

    ckpt = torch.load(
        Path(folder) / "model.ckpt", map_location="cpu", weights_only=False
    )
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    cs = [sd["stem.0.weight"].shape[2]]
    cs += [sd[f"stage{k}.1.net.0.weight"].shape[2] for k in range(1, 5)]
    cs += [sd[f"up{j}.0.net.0.weight"].shape[2] for j in range(1, 5)]
    cls = MinkowskiNet if model_name == "minkowskinet" else SPVCNN
    model = cls(
        layer_num=tuple(cs),
        cr=1.0,
        input_dims=sd["stem.0.weight"].shape[1],
        num_classes=sd["classifier.0.bias"].shape[0],
        voxel_size=_EVAL_VOXEL_SIZE,
        max_voxels=max_points,
    )
    return model, convert_torchsparse_state_dict(sd)


def _range_descriptors(clouds, data, root, agg_type="depth"):
    """Per-cloud FRID descriptors from the pretrained RangeNet folder
    (``{root}/{dataset}/rangenet/{backbone,segmentation_decoder}``; cf.
    ``metric_utils.compute_logits`` range path + ``rangenet/model.py:349-368``)."""
    from pathlib import Path

    import jax
    import torch

    from ..ops.projection import points_to_range_image
    from .extractor.rangenet import (
        RangeNet,
        convert_rangenet_folder,
        preprocess_range_input,
        rangenet_frid_descriptor,
    )

    folder = Path(root) / _TYPE2DATASET[data] / "rangenet"
    backbone = torch.load(folder / "backbone", map_location="cpu",
                          weights_only=False)
    decoder = torch.load(folder / "segmentation_decoder", map_location="cpu",
                         weights_only=False)
    params = convert_rangenet_folder(backbone, decoder)
    nrb8 = any(k.startswith("enc3.residual_7") for k in backbone)
    model = RangeNet(num_classes=17, backbone=53 if nrb8 else 21)
    H, W = (32, 1024) if data == "32" else (64, 1024)
    fov_up, fov_down = (10.0, -30.0) if data == "32" else (3.0, -25.0)

    @jax.jit
    def describe(img):
        # FRID aggregates the decoder feature map, not the class head
        # (``rangenet/model.py:308-312``: return_logits → pre-dropout x)
        feats = model.apply(params, preprocess_range_input(img), "decoder")
        return rangenet_frid_descriptor(feats, agg_type=agg_type)

    out = []
    for pts in clouds:
        pts = np.asarray(pts, np.float32)
        if pts.shape[1] < 4:
            pts = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
        img = points_to_range_image(
            jnp.asarray(pts[:, :4]), H=H, W=W,
            fov_up=fov_up, fov_down=fov_down,
        )
        x = jnp.concatenate(
            [img[..., 4:5], img[..., :3], img[..., 3:4]], axis=-1
        )[None]
        out.append(np.asarray(describe(x))[0])
    return np.stack(out)


def _sparse_descriptors(clouds, model_name, data, root, max_points):
    """Per-cloud 16-sector depth descriptors from a pretrained sparse
    backbone (cf. ``metric_utils.compute_logits`` voxel/point_voxel paths)."""
    from .extractor.sparse_unet import make_sparse_descriptor_fn

    dataset = _TYPE2DATASET[data]
    depth_range = _DEPTH_RANGE[dataset]
    from pathlib import Path

    model, params = _load_sparse_backbone(
        model_name, Path(root) / dataset / model_name, max_points
    )
    describe = make_sparse_descriptor_fn(
        model, params, agg_type="depth", depth_range=depth_range
    )
    out = []
    for pts in clouds:
        pts = np.asarray(pts, np.float32)[:, :3]
        depth = np.linalg.norm(pts, 2, axis=1)
        pts = pts[(depth > depth_range[0]) & (depth < depth_range[1])][:max_points]
        pad = np.zeros((max_points, 3), np.float32)
        pad[: len(pts)] = pts
        feats = np.concatenate([pad, -np.ones((max_points, 1), np.float32)], 1)
        mask = np.arange(max_points) < len(pts)
        out.append(
            np.asarray(describe(jnp.asarray(pad), jnp.asarray(feats), jnp.asarray(mask)))
        )
    return np.stack(out)


def evaluate(
    reference,
    samples,
    metrics,
    data: str = "32",
    features: dict | None = None,
    verbose: bool = True,
    pretrained_root: str | None = None,
    max_points: int = 32768,
) -> dict:
    """cf. ``eval_utils.evaluate`` (:18-37).  ``features`` may carry
    precomputed perceptual logits: {'range': (ref, gen), 'voxel': ...,
    'point_voxel': ...} for frid/fsvd/fpvd; otherwise fsvd/fpvd load the
    pretrained sparse backbone from ``pretrained_root`` (layout
    ``{root}/{dataset}/{model}/model.ckpt``, cf. ``metrics/__init__.py:23``
    DEFAULT_ROOT) and extract descriptors on the fly."""
    results = {}
    features = features or {}
    modality = {"frid": "range", "fsvd": "voxel", "fpvd": "point_voxel"}
    backbone = {"fsvd": "minkowskinet", "fpvd": "spvcnn"}
    for name in metrics:
        if name in modality:
            feats = features.get(modality[name])
            if feats is None and pretrained_root:
                if name in backbone:
                    feats = tuple(
                        _sparse_descriptors(
                            clouds, backbone[name], data, pretrained_root,
                            max_points,
                        )
                        for clouds in (reference, samples)
                    )
                elif name == "frid":
                    feats = tuple(
                        _range_descriptors(clouds, data, pretrained_root)
                        for clouds in (reference, samples)
                    )
            if feats is None:
                raise ValueError(
                    f"{name} needs precomputed '{modality[name]}' features "
                    "or a --pretrained-root with the eval checkpoints"
                )
            results[name] = compute_fd(*feats)
        elif name == "cd":
            results[name] = compute_cd(reference, samples)
        elif name == "emd":
            results[name] = compute_emd(reference, samples)
        elif name == "jsd":
            results[name] = compute_jsd(reference, samples, data)
        elif name == "mmd":
            results[name] = compute_mmd(reference, samples, data)
        else:
            raise ValueError(f"unknown metric: {name}")
        if verbose:
            print(OUTPUT_TEMPLATE.format(name.upper().ljust(4), results[name]))
    return results
