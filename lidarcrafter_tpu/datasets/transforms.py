"""Dataset-side geometric transforms (numpy host path + jnp device path).

Re-designs the per-sample math of ``lidargen/dataset/nuscenes_dataset.py``
(box scaling :146-175, box-condition encoding :198-218, 13-slot padding
:176-192, ground removal :262-273), ``nuscenes_object_dataset.py`` (box-frame
point normalization :40-65, 1024-pt resampling :72-93, validity :95-105) and
``lidargen/dataset/utils.py:37`` (``rotate_points_along_z``).

All functions are pure; numpy versions serve the input pipeline, jnp twins
(suffix ``_jnp``) serve the on-device rollout.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

POINTS_RANGE = (-80.0, -80.0, -8.0, 80.0, 80.0, 8.0)  # nuscenes_dataset.py:21

# nuScenes lidarseg → training labels; cf. ``nuscenes_dataset.py:634-669``
NUSC_LEARNING_MAP = {
    0: -1, 1: -1, 2: 6, 3: 6, 4: 6, 5: -1, 6: 6, 7: -1, 8: -1, 9: 0,
    10: -1, 11: -1, 12: 7, 13: -1, 14: 1, 15: 2, 16: 2, 17: 3, 18: 4,
    19: -1, 20: -1, 21: 5, 22: 8, 23: 9, 24: 10, 25: 11, 26: 12, 27: 13,
    28: 14, 29: -1, 30: 15, 31: -1,
}
GROUND_LABELS = (10, 12)  # "delete_ground" removes labels 10 and 12 (:272)


def rotate_points_along_z(points: np.ndarray, angle: np.ndarray) -> np.ndarray:
    """(B, N, 3+C) rotated by per-batch angle; cf. ``dataset/utils.py:37-60``.

    Convention matches the reference: p' = p @ R with R = [[c, s], [-s, c]]
    (x toward y for positive angle).
    """
    cosa, sina = np.cos(angle), np.sin(angle)
    zeros, ones = np.zeros_like(cosa), np.ones_like(cosa)
    rot = np.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)
    out = points.copy()
    out[..., :3] = np.matmul(points[..., :3], rot)
    return out


def rotate_points_along_z_jnp(points: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    cosa, sina = jnp.cos(angle), jnp.sin(angle)
    zeros, ones = jnp.zeros_like(cosa), jnp.ones_like(cosa)
    rot = jnp.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)
    xyz = jnp.matmul(points[..., :3], rot)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def remove_ego_points(points: np.ndarray, center_radius: float = 1.0) -> np.ndarray:
    """cf. ``nuscenes_dataset.py:275-277``."""
    mask = ~(
        (np.abs(points[:, 0]) < center_radius) & (np.abs(points[:, 1]) < center_radius)
    )
    return points[mask]


def delete_ground_points(points: np.ndarray, segment: np.ndarray) -> np.ndarray:
    """Drop driveable-surface / other-flat points; cf. ``nuscenes_dataset.py:262-273``."""
    lut = np.full(32, -1, np.int64)
    for k, v in NUSC_LEARNING_MAP.items():
        lut[k] = v
    mapped = lut[segment]
    mask = (mapped != GROUND_LABELS[0]) & (mapped != GROUND_LABELS[1])
    return points[mask]


# ------------------------------------------------------------------ boxes


def scale_boxes_3d(boxes_3d: np.ndarray, points_range=POINTS_RANGE) -> np.ndarray:
    """(N, ≥7) → (N, D+1): normalized center, log sizes, (sin, cos) yaw;
    cf. ``nuscenes_dataset.py:146-160``."""
    boxes_3d = np.asarray(boxes_3d, np.float64).copy()
    n, d = boxes_3d.shape
    out = np.zeros((n, d + 1))
    x_min, y_min, z_min = points_range[0], points_range[1], points_range[2]
    out[:, 0] = boxes_3d[:, 0] / (0 - x_min)
    out[:, 1] = boxes_3d[:, 1] / (0 - y_min)
    out[:, 2] = boxes_3d[:, 2] / (0 - z_min)
    out[:, 3:6] = np.log(boxes_3d[:, 3:6] + 1e-6)
    out[:, 6] = np.sin(boxes_3d[:, 6])
    out[:, 7] = np.cos(boxes_3d[:, 6])
    if d > 7:
        out[:, 8:] = boxes_3d[:, 7:]
    return out


def unscale_boxes_3d(boxes_3d_traj: np.ndarray, points_range=POINTS_RANGE):
    """(N, 8+12) scaled boxes+trajs → ((N, 7) metric boxes, (N, 6, 2) trajs);
    cf. ``nuscenes_dataset.py:162-175`` (row 0 = ego is zeroed)."""
    scaled = np.asarray(boxes_3d_traj[:, :8], np.float64)
    trajs = np.asarray(boxes_3d_traj[:, 8:], np.float64)
    n = scaled.shape[0]
    out = np.zeros((n, 7))
    x_min, y_min, z_min = points_range[0], points_range[1], points_range[2]
    out[:, 0] = scaled[:, 0] * (0 - x_min)
    out[:, 1] = scaled[:, 1] * (0 - y_min)
    out[:, 2] = scaled[:, 2] * (0 - z_min)
    out[:, 3:6] = np.exp(scaled[:, 3:6])
    out[:, 6] = np.arctan2(scaled[:, 6], scaled[:, 7])
    out[0, :] = 0
    return out, trajs.reshape(n, 6, 2)


def encoding_boxes_3d(
    box_3d: np.ndarray, unique_mode: bool = True, points_range=POINTS_RANGE
) -> np.ndarray:
    """Per-box condition encoding (d, z, log sizes, angle terms);
    cf. ``nuscenes_dataset.py:198-218``."""
    x, y, z, w, h, l, yaw = np.asarray(box_3d[:7], np.float64)
    x_min, y_min, z_min = points_range[0], points_range[1], points_range[2]
    out = np.zeros(8, np.float32)
    x_norm = x / (0 - x_min)
    y_norm = y / (0 - y_min)
    z_norm = z / (0 - z_min)
    out[0] = np.hypot(x_norm, y_norm)
    out[1] = z_norm
    out[2:5] = np.log(np.array([w, h, l]) + 1e-6)
    if unique_mode:
        out[5] = yaw - np.arctan2(y, x)
        return out[:6]
    out[5] = (-np.arctan2(y, x) / np.pi + 1) / 2 % 1
    out[6] = np.sin(yaw)
    out[7] = np.cos(yaw)
    return out


def object_encoding_boxes_3d(box_3d: np.ndarray, points_range=POINTS_RANGE) -> np.ndarray:
    """Object-branch box encoding; cf. ``nuscenes_object_dataset.py:50-65``
    (min-max normalized center, unlike the scene variant)."""
    x, y, z, w, h, l, yaw = np.asarray(box_3d[:7], np.float64)
    x_min, y_min, z_min, x_max, y_max, z_max = points_range
    out = np.zeros(6, np.float32)
    x_norm = (x - x_min) / (x_max - x_min)
    y_norm = (y - y_min) / (y_max - y_min)
    z_norm = (z - z_min) / (z_max - z_min)
    out[0] = np.hypot(x_norm, y_norm)
    out[1] = z_norm
    out[2:5] = np.log(np.array([w, h, l]) + 1e-6)
    out[5] = yaw - np.arctan2(y, x)
    return out


def align_box_num(
    bbox_3d: np.ndarray,
    bbox_2d: np.ndarray,
    fg_encoding_box: np.ndarray,
    expect_box_num: int = 13,
):
    """Pad/crop to a static box slot count; cf. ``nuscenes_dataset.py:176-192``."""
    n = bbox_3d.shape[0]
    if n > expect_box_num:
        valid = np.ones(expect_box_num)
        return (
            bbox_3d[:expect_box_num],
            bbox_2d[:expect_box_num],
            fg_encoding_box[:expect_box_num],
            valid,
        )
    out3 = np.zeros((expect_box_num, bbox_3d.shape[-1]), bbox_3d.dtype)
    out2 = np.zeros((expect_box_num, bbox_2d.shape[-1]), bbox_2d.dtype)
    oute = np.zeros((expect_box_num, fg_encoding_box.shape[-1]), fg_encoding_box.dtype)
    out3[:n] = bbox_3d
    out2[:n] = bbox_2d
    oute[:n] = fg_encoding_box
    valid = np.zeros(expect_box_num)
    valid[:n] = 1
    return out3, out2, oute, valid


# ------------------------------------------------------------------ objects


def norm_fg_points(fg_points: np.ndarray, box3d: np.ndarray) -> np.ndarray:
    """Box-frame normalization of object points; cf.
    ``nuscenes_object_dataset.py:40-48``."""
    out = rotate_points_along_z(
        fg_points[np.newaxis], -np.asarray([box3d[6]], np.float64)
    )[0]
    out[:, 0] = 2 * out[:, 0] / box3d[3]
    out[:, 1] = 2 * out[:, 1] / box3d[4]
    out[:, 2] = 2 * out[:, 2] / box3d[5]
    out[:, 3] = 2 * (out[:, 3] / 255.0) - 1
    return out


def unnorm_fg_points(obj_points: np.ndarray, box3d: np.ndarray) -> np.ndarray:
    """Inverse of box-frame normalization + placement at the box; cf.
    ``nuscenes_dataset.py:220-248`` (unscaled_objs_3d inner loop)."""
    out = obj_points.copy()
    out[:, 0] = out[:, 0] * box3d[3] / 2.0
    out[:, 1] = out[:, 1] * box3d[4] / 2.0
    out[:, 2] = out[:, 2] * box3d[5] / 2.0
    out[:, 3] = 255 * (out[:, 3] + 1) / 2
    out = rotate_points_along_z(out[np.newaxis], np.asarray([box3d[6]], np.float64))[0]
    out[:, :3] += np.asarray(box3d[:3])[None]
    return out


def sample_points(points: np.ndarray, num_samples: int, rng=np.random) -> np.ndarray:
    """Fixed-count resampling with near-point preference; cf.
    ``nuscenes_object_dataset.py:72-93``."""
    N = len(points)
    if N <= num_samples:
        return points[rng.choice(N, num_samples, replace=True)]
    pts_depth = np.linalg.norm(points[:, :3], axis=1)
    near = np.where(pts_depth < 0.1)[0]
    far = np.where(pts_depth >= 0.1)[0]
    if num_samples > len(far):
        near_choice = rng.choice(near, num_samples - len(far), replace=False)
        choice = np.concatenate([near_choice, far]) if len(far) > 0 else near_choice
    else:
        choice = rng.choice(np.arange(N), num_samples, replace=False)
    rng.shuffle(choice)
    return points[choice]


def object_is_valid(num_points_in_gt: int, box3d, points_range=POINTS_RANGE) -> bool:
    """cf. ``nuscenes_object_dataset.py:95-105``."""
    if num_points_in_gt < 50:
        return False
    return (
        points_range[0] <= box3d[0] <= points_range[3]
        and points_range[1] <= box3d[1] <= points_range[4]
        and points_range[2] <= box3d[2] <= points_range[5]
    )
