"""High-level evaluation engine; mirrors ``tools/evaluation/evaluate_our.py:128-446``.

Orchestrates feature extraction (RangeNet image logits, PointNet cloud
features, BEV histograms) over real and generated sample sets with on-disk
caching, then computes the scene-level suite: FRD/FPD (Fréchet + squared MMD),
BEV JSD/MMD, and optional CD/EMD — the same metric names and JSON layout as
the reference.

Object-level (cgf/rgf/dcf) and sequence-level (ttce/tcd) metrics have their
own drivers (``fg_object.py``, ``temporal.py``).
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Callable, Iterable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.bev import point_cloud_to_histogram
from ..ops.projection import points_to_range_image
from ..utils.lidar import LiDARUtility
from .bev import compute_jsd_2d, compute_mmd_2d
from .distribution import compute_frechet_distance, compute_squared_mmd
from .eval_suite import compute_cd, compute_emd


class EvaluationEngine:
    """cf. ``EvaluationEngine`` (``evaluate_our.py:128-446``).

    ``rangenet_apply(img (B,H,W,5)) -> (B, F)`` and
    ``pointnet_apply(pts (B,N,3)) -> (B, F)`` are bound flax extractors (pass
    None to skip the corresponding metrics).
    """

    def __init__(
        self,
        lidar_utils: LiDARUtility | None = None,
        rangenet_apply: Callable | None = None,
        pointnet_apply: Callable | None = None,
        voxel_apply: Callable | None = None,
        point_voxel_apply: Callable | None = None,
        cache_dir: str | None = None,
        num_points_pointnet: int = 2048,
        max_points_sparse: int = 32768,
        depth_range: tuple = (1.0, 45.0),
    ):
        self.lidar_utils = lidar_utils or LiDARUtility.create(
            (32, 1024), "log_depth", 1.45, 80.0
        )
        self.rangenet_apply = rangenet_apply
        self.pointnet_apply = pointnet_apply
        self.voxel_apply = voxel_apply
        self.point_voxel_apply = point_voxel_apply
        self.cache_dir = Path(cache_dir) if cache_dir else None
        self.num_points_pointnet = num_points_pointnet
        self.max_points_sparse = max_points_sparse
        self.depth_range = depth_range

    # ------------------------------------------------------------- features

    def _range_input(self, points: np.ndarray) -> jnp.ndarray:
        """Cloud → (1, H, W, 5) [range, x, y, z, remission] RangeNet input;
        cf. ``metric_utils.preprocess_range``."""
        H, W = self.lidar_utils.resolution
        img = points_to_range_image(
            jnp.asarray(points[:, :4] if points.shape[1] >= 4 else
                        np.concatenate([points, np.zeros((len(points), 1), np.float32)], 1)),
            H=H, W=W,
            min_depth=self.lidar_utils.min_depth,
            max_depth=self.lidar_utils.max_depth,
        )
        depth = img[..., 4:5] * img[..., 5:6]
        xyz = img[..., :3] * img[..., 5:6]
        remission = img[..., 3:4] * img[..., 5:6]
        return jnp.concatenate([depth, xyz, remission], axis=-1)[None]

    def _subsample(self, points: np.ndarray) -> np.ndarray:
        n = self.num_points_pointnet
        if len(points) >= n:
            idx = np.random.RandomState(0).choice(len(points), n, replace=False)
        else:
            idx = np.random.RandomState(0).choice(len(points), n, replace=True)
        return points[idx, :3]

    def _sparse_input(self, points: np.ndarray):
        """Cloud → padded (pts, feats [x,y,z,-1], mask) for the sparse
        backbones; cf. ``metric_utils.preprocess_pcd`` (depth gate) +
        ``pcd2voxel`` (``metric_utils.py:157-167``: remission placeholder
        -1, round-to-voxel handled inside the model via a half-voxel shift)."""
        pts = points[:, :3]
        depth = np.linalg.norm(pts, 2, axis=1)
        pts = pts[(depth > self.depth_range[0]) & (depth < self.depth_range[1])]
        P = self.max_points_sparse
        pts = pts[:P]
        n = len(pts)
        pad = np.zeros((P, 3), np.float32)
        pad[:n] = pts
        feats = np.concatenate([pad, -np.ones((P, 1), np.float32)], 1)
        mask = np.arange(P) < n
        return jnp.asarray(pad), jnp.asarray(feats), jnp.asarray(mask)

    def extract_features(self, clouds: Iterable[np.ndarray], tag: str) -> dict:
        """Per-set features with pkl caching; cf. ``load_real_dataset``
        (``evaluate_our.py:190-237``)."""
        if self.cache_dir is not None:
            cache = self.cache_dir / f"features_{tag}.pkl"
            if cache.exists():
                with open(cache, "rb") as f:
                    return pickle.load(f)
        feats = {"rangenet": [], "pointnet": [], "bev_hist": [],
                 "voxel": [], "point_voxel": []}
        for pts in clouds:
            pts = np.asarray(pts, np.float32)
            feats["bev_hist"].append(
                np.asarray(point_cloud_to_histogram(jnp.asarray(pts[:, :3])))
            )
            if self.rangenet_apply is not None:
                feats["rangenet"].append(
                    np.asarray(self.rangenet_apply(self._range_input(pts)))[0]
                )
            if self.pointnet_apply is not None:
                feats["pointnet"].append(
                    np.asarray(
                        self.pointnet_apply(jnp.asarray(self._subsample(pts))[None])
                    )[0]
                )
            if self.voxel_apply is not None or self.point_voxel_apply is not None:
                sp = self._sparse_input(pts)
                if self.voxel_apply is not None:
                    feats["voxel"].append(np.asarray(self.voxel_apply(*sp)))
                if self.point_voxel_apply is not None:
                    feats["point_voxel"].append(
                        np.asarray(self.point_voxel_apply(*sp))
                    )
        out = {k: (np.stack(v) if v else None) for k, v in feats.items()}
        if self.cache_dir is not None:
            self.cache_dir.mkdir(parents=True, exist_ok=True)
            with open(self.cache_dir / f"features_{tag}.pkl", "wb") as f:
                pickle.dump(out, f)
        return out

    # -------------------------------------------------------------- evaluate

    def evaluate(
        self,
        real_clouds: Sequence[np.ndarray],
        gen_clouds: Sequence[np.ndarray],
        metrics: Sequence[str] = ("frd", "fpd", "jsd", "mmd"),
        output_json: str | None = None,
    ) -> dict:
        """cf. ``evaluate`` (``evaluate_our.py:322-446``)."""
        real = self.extract_features(real_clouds, "real")
        gen = self.extract_features(gen_clouds, "gen")
        results: dict = {}
        if "frd" in metrics and real["rangenet"] is not None:
            results["frd"] = compute_frechet_distance(real["rangenet"], gen["rangenet"])
            results["frd_mmd"] = compute_squared_mmd(real["rangenet"], gen["rangenet"])
        if "fpd" in metrics and real["pointnet"] is not None:
            results["fpd"] = compute_frechet_distance(real["pointnet"], gen["pointnet"])
            results["fpd_mmd"] = compute_squared_mmd(real["pointnet"], gen["pointnet"])
        if "fsvd" in metrics and real["voxel"] is not None:
            results["fsvd"] = compute_frechet_distance(real["voxel"], gen["voxel"])
            results["fsvd_mmd"] = compute_squared_mmd(real["voxel"], gen["voxel"])
        if "fpvd" in metrics and real["point_voxel"] is not None:
            results["fpvd"] = compute_frechet_distance(
                real["point_voxel"], gen["point_voxel"]
            )
            results["fpvd_mmd"] = compute_squared_mmd(
                real["point_voxel"], gen["point_voxel"]
            )
        if "jsd" in metrics:
            results["jsd"] = compute_jsd_2d(
                jnp.asarray(real["bev_hist"]), jnp.asarray(gen["bev_hist"])
            )
        if "mmd" in metrics:
            results["mmd"] = compute_mmd_2d(
                jnp.asarray(real["bev_hist"]), jnp.asarray(gen["bev_hist"])
            )
        if "cd" in metrics:
            results["cd"] = compute_cd(real_clouds, gen_clouds)
        if "emd" in metrics:
            results["emd"] = compute_emd(real_clouds, gen_clouds)
        if output_json:
            with open(output_json, "w") as f:
                json.dump({k: float(v) for k, v in results.items()}, f, indent=2)
        return results
