"""Object uncertainty dataset + 10-fold split for GLENet / RGF.

Mirrors ``lidargen/metrics/datasets/object_uncertainty_dataset.py``: the
reference trains/evals GLENet per KFold(10, shuffle, seed 42) fold over the
['car','truck','bus'] object crops, normalizing each crop by the point-cloud
mean and the car anchor (3.9, 1.6, 1.56), resampling to 512 points with
replacement, and encoding the GT box as (center/diag, log size/anchor, yaw)
(``object_uncertainty_dataset.py:110-211``).  The RGF metric
(``lidargen/metrics/fg_object.py:346-500``) aggregates 30 MC eval passes per
fold; eval keys are ``{val_idx}_{val_idx}`` (``:383-385``).
"""

from __future__ import annotations

import numpy as np

from . import transforms as T

CLASS_NAMES = ("car", "truck", "bus")  # cf. fg_object.py:364 (similar-type off)
POINT_ANCHOR_SIZE = (3.9, 1.6, 1.56)  # cf. object_uncertainty_dataset.py:138
KEEP_NUM = 512  # cf. :161
ANGLE_ROT_MAX = 0.78539816  # exp20.yaml ANGLE_ROT_MAX
SCALE_RANGE = (0.95, 1.05)  # exp20.yaml RANDOM_SCALE_RANGE


def kfold_val_indices(n: int, n_splits: int = 10, seed: int = 42) -> list:
    """Validation indices per fold, exactly matching sklearn
    ``KFold(n_splits, shuffle=True, random_state=seed)`` (the reference split,
    ``object_uncertainty_dataset.py:63-67``): a seeded permutation is cut into
    ``n % n_splits`` folds of size ``n//n_splits + 1`` followed by folds of
    size ``n//n_splits``; indices come back SORTED (sklearn routes them
    through a boolean mask)."""
    idx = np.arange(n)
    np.random.RandomState(seed).shuffle(idx)
    sizes = np.full(n_splits, n // n_splits, dtype=int)
    sizes[: n % n_splits] += 1
    out, cur = [], 0
    for s in sizes:
        out.append(np.sort(idx[cur : cur + s]))
        cur += s
    return out


def flatten_uncertainty_infos(infos, class_names=CLASS_NAMES) -> list:
    """Flatten a foreground-samples info dict ({class: [recs]}) in dict order,
    or filter a flat list by ``name`` — cf. ``fg_object.py:365-375`` /
    ``object_uncertainty_dataset.py:56-61``."""
    if isinstance(infos, dict):
        out = []
        for key, value in infos.items():
            if key in class_names:
                out.extend(value)
        return out
    return [info for info in infos if info["name"] in class_names]


def encode_gt_box(box7, x_mean, y_mean, z_mean, pos_shift=(0.0, 0.0),
                  angle_rot=0.0, noise_scale=1.0, flip=False):
    """GT box → 7-dim regression target; cf.
    ``object_uncertainty_dataset.py:179-192``."""
    dxa, dya, dza = POINT_ANCHOR_SIZE
    diagonal = float(np.sqrt(dxa**2 + dya**2))
    box = np.asarray(box7, np.float64)[:7].copy()
    if flip:
        box[6] = -box[6]
    box[:6] *= noise_scale
    box[0] = (-x_mean + pos_shift[0]) / diagonal
    box[1] = (-y_mean + pos_shift[1]) / diagonal
    box[2] = (-z_mean) / dza
    box[3] = np.log(box[3] / dxa)
    box[4] = np.log(box[4] / dya)
    box[5] = np.log(box[5] / dza)
    box[6] += angle_rot
    return box.astype(np.float32)


def decode_boxes(boxes) -> np.ndarray:
    """Undo the anchor encoding in-place-semantics of the reference eval
    (``glenet/eval_utils/eval_utils.py:154-166``): centers × diagonal/dza,
    sizes exp(·) × anchor; yaw untouched.  Accepts (N, 7+)."""
    dxa, dya, dza = POINT_ANCHOR_SIZE
    diagonal = float(np.sqrt(dxa**2 + dya**2))
    out = np.asarray(boxes, np.float64).copy()
    out[:, 0] *= diagonal
    out[:, 1] *= diagonal
    out[:, 2] *= dza
    out[:, 3] = np.exp(out[:, 3]) * dxa
    out[:, 4] = np.exp(out[:, 4]) * dya
    out[:, 5] = np.exp(out[:, 5]) * dza
    return out.astype(np.float32)


class ObjectUncertaintyDataset:
    """Per-fold GLENet dataset; cf. ``Object_Uncertainty_Dataset``.

    ``infos``: flat list of crop records ({path, name, num_points_in_gt,
    box3d_lidar}).  ``fold_idx`` selects the KFold(10, shuffle, 42) split;
    ``training`` picks the train or val side. ``text_feat``: {class: (1,512)}
    CLIP table (``obj_text_feat.pkl`` format).
    """

    def __init__(self, infos, fold_idx, text_feat, training=True,
                 point_dims=4, class_names=CLASS_NAMES, rng=None):
        self.infos_all = flatten_uncertainty_infos(infos, class_names)
        folds = kfold_val_indices(len(self.infos_all))
        val_idx = folds[fold_idx]
        train_idx = np.setdiff1d(np.arange(len(self.infos_all)), val_idx)
        self.frame_ids = val_idx  # eval keys use the GLOBAL index (:68,209)
        sel = train_idx if training else val_idx
        self.infos = [self.infos_all[i] for i in sel]
        self.training = training
        self.text_feat = text_feat
        self.point_dims = point_dims
        self.rng = rng if rng is not None else np.random

    def __len__(self):
        return len(self.infos)

    def _load_points(self, info):
        if "points" in info:  # in-memory records (tests / synthetic)
            return np.asarray(info["points"], np.float32)[:, :3].copy()
        pts = np.fromfile(info["path"], np.float32)
        return pts.reshape(-1, self.point_dims)[:, :3].copy()

    def __getitem__(self, index):
        info = self.infos[index]
        points = self._load_points(info)

        flip_mark, noise_scale = False, 1.0
        pos_shift, angle_rot = np.zeros(2), 0.0
        if self.training:
            noise_scale = self.rng.uniform(*SCALE_RANGE)
            points[:, :3] *= noise_scale
            angle_rot = (self.rng.rand(1)[0] - 0.5) / 0.5 * ANGLE_ROT_MAX
            points = T.rotate_points_along_z(
                points[None], np.asarray([angle_rot])
            )[0]

        if points.shape[0] != 0:
            x_mean, y_mean, z_mean = points[:, :3].mean(axis=0)
        else:
            x_mean = y_mean = z_mean = 0.0

        dxa, dya, dza = POINT_ANCHOR_SIZE
        diagonal = np.sqrt(dxa**2 + dya**2)
        points[:, 0] = (points[:, 0] - x_mean + pos_shift[0]) / diagonal
        points[:, 1] = (points[:, 1] - y_mean + pos_shift[1]) / diagonal
        points[:, 2] = (points[:, 2] - z_mean) / dza

        if points.shape[0] != 0:
            choice = self.rng.choice(points.shape[0], KEEP_NUM, replace=True)
            points = points[choice]
        else:
            points = np.zeros((KEEP_NUM, 3), np.float32)

        box7 = encode_gt_box(
            info["box3d_lidar"], x_mean, y_mean, z_mean, pos_shift,
            angle_rot, noise_scale, flip_mark,
        )
        box8 = np.concatenate(
            [box7[:6], [np.sin(box7[6]), np.cos(box7[6])]]
        ).astype(np.float32)

        tf = np.asarray(self.text_feat[info["name"]], np.float32).reshape(-1)
        out = {
            "points": points.astype(np.float32),  # (512, 3)
            "gt_boxes_input": box8,
            "gt_boxes": box7,
            "text_feat": tf,
        }
        if not self.training:
            out["frame_id"] = int(self.frame_ids[index])
        return out

    def batches(self, batch_size):
        """Collated fixed-key batches (stacked numpy), in order."""
        for i in range(0, len(self), batch_size):
            items = [self[j] for j in range(i, min(i + batch_size, len(self)))]
            yield {
                k: np.stack([it[k] for it in items]) for k in items[0]
            }
