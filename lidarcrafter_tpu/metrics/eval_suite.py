"""Metric-suite orchestration; cf. ``lidargen/metrics/eval_utils.py:18-136``.

``evaluate(reference, samples, metrics, data)`` dispatches over the same
metric names the reference supports.  Scene-distribution metrics that need
perceptual backbones (frid/fsvd/fpvd) accept precomputed logits via the
``features`` argument until the extractor ports land; cd/emd/jsd/mmd run fully
on-device from raw point lists.
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


def evaluate(
    reference,
    samples,
    metrics,
    data: str = "32",
    features: dict | None = None,
    verbose: bool = True,
) -> dict:
    """cf. ``eval_utils.evaluate`` (:18-37).  ``features`` may carry
    precomputed perceptual logits: {'range': (ref, gen), 'voxel': ...,
    'point_voxel': ...} for frid/fsvd/fpvd."""
    results = {}
    features = features or {}
    modality = {"frid": "range", "fsvd": "voxel", "fpvd": "point_voxel"}
    for name in metrics:
        if name in modality:
            feats = features.get(modality[name])
            if feats is None:
                raise ValueError(
                    f"{name} needs precomputed '{modality[name]}' features "
                    "(perceptual backbone ports pending)"
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
