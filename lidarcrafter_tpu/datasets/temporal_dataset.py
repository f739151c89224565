"""Temporal prev-frame conditioned dataset (nuscenes-temporal).

Re-designs ``lidargen/dataset/nuscenes_temporal_dataset.py`` (237 LoC): pairs
each frame with its previous frame projected into the current lidar frame with
a per-point semantic label channel (fg class id per box, 0 = background) —
the ``prev_cond`` consumed by ``train_lidm_cond.preprocess_prev_cond``.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from ..ops.points import points_in_boxes
from ..ops.projection import points_to_range_image
from .nuscenes import NuscDataset


class NuscTempDataset(NuscDataset):
    def __init__(self, cfg, infos=None):
        super().__init__(cfg, infos=infos)
        self.data_dict = {info["token"]: info for info in self.data}
        self.data = [
            di
            for di in self.data
            if di.get("prev_info", {}).get("valid")
            and di["prev_info"]["token"] in self.data_dict
        ]

    def get_prev_points(self, prev_data_info: dict, prev_info: dict) -> np.ndarray:
        """Prev cloud + per-point fg class labels, transformed into the current
        lidar frame; cf. ``nuscenes_temporal_dataset.py:175-203``."""
        prev_points = self._load_points(prev_data_info)
        labels = np.zeros((len(prev_points), 1), np.float32)
        names = prev_data_info["scene_graph"]["keep_box_names"][1:]
        boxes = prev_data_info["scene_graph"]["keep_box"][1:, :7]
        classes = np.array([self.class_names.index(n) for n in names]) + 1
        if len(boxes):
            member = np.asarray(
                points_in_boxes(
                    jnp.asarray(prev_points[:, :3]),
                    jnp.asarray(boxes.astype(np.float32)),
                )
            )
            for box_id, cls in enumerate(classes):
                labels[member[box_id] > 0, 0] = cls
        pts = np.concatenate([prev_points, labels], axis=1)

        rot = np.asarray(prev_info["sensor2lidar_rotation"])
        trans = np.asarray(prev_info["sensor2lidar_translation"])
        pts[:, :3] = pts[:, :3] @ rot.T
        pts[:, :3] -= -(rot.T @ trans.reshape(3, 1)).ravel()
        return pts

    def get_prev_as_condition(self, info: dict) -> np.ndarray:
        """(H, W, 7) [xyz, intensity, label, depth, mask] masked image;
        cf. ``:206-214`` (custom_feat_dim=1)."""
        prev = self.data_dict[info["prev_info"]["token"]]
        pts = self.get_prev_points(prev, info["prev_info"])
        H, W = self.resolution
        img = np.asarray(
            points_to_range_image(
                jnp.asarray(pts.astype(np.float32)), H=H, W=W,
                min_depth=self.data_cfg.min_depth,
                max_depth=self.data_cfg.max_depth,
                fov_up=self.data_cfg.fov_up,
                fov_down=self.data_cfg.fov_down,
            )
        )
        return img * img[..., -1:]

    def __getitem__(self, idx: int) -> dict:
        info = self.data[idx]
        out = {"token": info["token"]}
        out.update(self.project(self._load_points(info)))
        out["prev_cond"] = self.get_prev_as_condition(info)
        return out
