"""nuScenes semantic-segmentation range-image dataset (RangeNet training).

Re-designs ``lidargen/metrics/datasets/nusc_seg_dataset.py:74-216``
(NuScenesDataset): loads the 10-sweep info pkls, raw ``.bin`` clouds and
lidarseg ``uint8`` labels, maps raw labels through the 32→16 learning map
(shifted +1 so 0 stays the void/empty-pixel class with loss weight 0), rides
the label as an extra feature column through the same range projection the
generation datasets use, and masks all channels by pixel validity.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from ..ops.projection import points_to_range_image
from .transforms import NUSC_LEARNING_MAP

NUM_SEG_CLASSES = 17  # 16 mapped classes + void (cf. trainer ``num_class``)


def seg_learning_lut() -> np.ndarray:
    """Raw nuScenes label → training label (mapped + 1; unknowns → 0)."""
    lut = np.zeros(32 + 100, np.int64)
    for k, v in NUSC_LEARNING_MAP.items():
        lut[k] = v + 1  # -1 (ignored) → 0 = void
    return lut


class NuscSegDataset:
    """``__getitem__`` → {'xyz', 'reflectance', 'depth', 'mask' (H,W,C),
    'segment' (H,W) int}; cf. ``nusc_seg_dataset.py:121-163`` get_data."""

    def __init__(
        self,
        info_path: str,
        data_root: str,
        resolution=(32, 1024),
        min_depth: float = 1.45,
        max_depth: float = 80.0,
        fov_up: float = 10.0,
        fov_down: float = -30.0,
    ):
        self.data_root = data_root
        self.resolution = tuple(resolution)
        self.min_depth, self.max_depth = min_depth, max_depth
        self.fov_up, self.fov_down = fov_up, fov_down
        with open(info_path, "rb") as f:
            self.data = pickle.load(f)
        self.lut = seg_learning_lut()

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int) -> dict:
        info = self.data[idx % len(self.data)]
        points = np.fromfile(
            os.path.join(self.data_root, info["lidar_path"]), dtype=np.float32
        ).reshape(-1, 5)[:, :4]
        if "gt_segment_path" in info:
            raw = np.fromfile(
                os.path.join(self.data_root, info["gt_segment_path"]), dtype=np.uint8
            )
            segment = self.lut[raw].astype(np.float32)
        else:
            segment = np.ones((points.shape[0],), np.float32)
        return self.project(points, segment)

    def project(self, points: np.ndarray, segment: np.ndarray) -> dict:
        H, W = self.resolution
        img = np.asarray(
            points_to_range_image(
                np.concatenate([points, segment[:, None]], 1),
                H=H, W=W,
                min_depth=self.min_depth, max_depth=self.max_depth,
                fov_up=self.fov_up, fov_down=self.fov_down,
            )
        )
        img = img * img[..., 6:7]  # zero all channels at empty pixels
        return {
            "xyz": img[..., :3],
            "reflectance": img[..., 3:4] / 255.0,
            "segment": img[..., 4].astype(np.int32),
            "depth": img[..., 5:6],
            "mask": img[..., 6:7],
        }

    @staticmethod
    def collate_fn(batch: list[dict]) -> dict:
        return {k: np.stack([b[k] for b in batch]) for k in batch[0]}

    @staticmethod
    def rangenet_input(batch: dict) -> np.ndarray:
        """Collated batch → (B, H, W, 5) [depth, x, y, z, remission]."""
        return np.concatenate(
            [batch["depth"], batch["xyz"], batch["reflectance"]], axis=-1
        )
