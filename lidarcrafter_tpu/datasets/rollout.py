"""Autoregressive 4D rollout geometry — on-device, fixed-shape.

Re-designs the reference's host-side rollout utilities
(``tools/vis_tools/utils/pipe_related.py:28-290`` and the warp math of
``tools/vis_tools/utils/common.py:59-225``), which round-trip device↔host
every frame (``sample_and_save_temporal.py:284-335``).  Here every step —
fg/bg split, per-object align/replay, ego-motion transforms, fg deletion — is
a jit-able function over padded arrays, so the 15-step rollout can run as one
on-device loop (the BASELINE.json north star).

Conventions: points (N, 4) [x, y, z, intensity] + bool mask; boxes (K, 7)
[x, y, z, dx, dy, dz, yaw] + bool mask; trajectories (·, T, 2).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.points import points_in_boxes
from .transforms import rotate_points_along_z_jnp


# ------------------------------------------------------------- trajectories


def interp_trajs(trajs: np.ndarray, M: int) -> np.ndarray:
    """Linear resampling of (K, N, 2) trajectories to (K, M, 2);
    cf. ``pipe_related.py:229-241``.

    One vectorized lerp over all trajectories/axes: for each target time u
    on the uniform grid, blend the bracketing knots —
    ``out[u] = (1-w)·traj[lo] + w·traj[lo+1]``."""
    _, N, _ = trajs.shape
    if N == 1:  # constant extension, like np.interp on a single knot
        return np.repeat(trajs, M, axis=1).astype(trajs.dtype)
    pos = np.linspace(0.0, float(N - 1), M)
    lo = np.minimum(pos.astype(np.int64), N - 2)
    w = (pos - lo)[None, :, None]
    return ((1.0 - w) * trajs[:, lo] + w * trajs[:, lo + 1]).astype(trajs.dtype)


def expand_future_trajs(gt_fut_trajs: np.ndarray, M: int | None = None):
    """Per-agent deltas → (ego_traj (T, 2) cumulative, obj_trajs (K-1, T, 2));
    cf. ``pipe_related.py:29-41`` (row 0 is the ego agent)."""
    trajs = np.insert(gt_fut_trajs, 0, 0, axis=1)
    acc = np.cumsum(trajs, axis=1)
    if M is not None:
        acc = interp_trajs(acc, M=M)
    deltas = acc[:, 1:] - acc[:, :-1]
    ego = np.cumsum(deltas[0], axis=0)  # (T, 2)
    obj = np.cumsum(deltas[1:], axis=1)  # (K-1, T, 2)
    return ego, obj


def _heading_from_offsets(offsets: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """yaw = atan2(dy, dx) − π/2, snapped to 0 for small motion;
    cf. ``common.py:79-87``."""
    yaw = jnp.arctan2(offsets[:, 1], offsets[:, 0]) - jnp.pi / 2
    return jnp.where(jnp.linalg.norm(offsets, axis=1) < thresh, 0.0, yaw)


def ego_yaws(future_xy: jnp.ndarray, thresh: float = 1e-1) -> jnp.ndarray:
    offsets = jnp.concatenate([future_xy[:1], future_xy[1:] - future_xy[:-1]], axis=0)
    return _heading_from_offsets(offsets, thresh)


# ----------------------------------------------------------------- warping


@jax.jit
def warp_lidar_future(P: jnp.ndarray, future_xy: jnp.ndarray, z0: float = 0.0):
    """Current-frame cloud → each future LiDAR frame; cf. ``common.py:59-115``.

    P (M, 4) → (T, M, 4).
    """
    yaws = ego_yaws(future_xy)
    xyz = P[:, :3]

    def per_t(xy, yaw):
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        R = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], P.dtype)
        translated = xyz - jnp.array([xy[0], xy[1], z0], P.dtype)
        rotated = translated @ R
        return jnp.concatenate([rotated, P[:, 3:4]], axis=1)

    return jax.vmap(per_t)(future_xy, yaws)


@jax.jit
def warp_boxes_future(
    boxes0: jnp.ndarray,
    traj_obj: jnp.ndarray,
    traj_ego: jnp.ndarray,
    z_e: float = 0.0,
) -> jnp.ndarray:
    """Future per-object boxes in each future LiDAR frame; cf.
    ``common.py:117-173``.  boxes0 (K, 7), traj_obj (K, T, 2), traj_ego (T, 2)
    → (K, T, 7)."""
    K, T = traj_obj.shape[0], traj_obj.shape[1]
    yaw_ego = ego_yaws(traj_ego)

    # object heading: keep previous yaw while stationary (cf. :136-145)
    obj_offsets = jnp.concatenate(
        [jnp.zeros((K, 1, 2), boxes0.dtype), traj_obj[:, 1:] - traj_obj[:, :-1]],
        axis=1,
    )
    step_yaw = jnp.arctan2(obj_offsets[..., 1], obj_offsets[..., 0])  # (K, T)
    moving = jnp.linalg.norm(obj_offsets, axis=-1) >= 1e-3

    def yaw_scan(prev, xs):
        sy, mv = xs
        cur = jnp.where(mv, sy, prev)
        return cur, cur

    def per_obj_yaws(yaw0, sy, mv):
        _, ys = jax.lax.scan(yaw_scan, yaw0, (sy[1:], mv[1:]))
        return jnp.concatenate([yaw0[None], ys])

    yaw_obj = jax.vmap(per_obj_yaws)(boxes0[:, 6], step_yaw, moving)  # (K, T)

    c_e, s_e = jnp.cos(yaw_ego), jnp.sin(yaw_ego)

    def per_obj(box, traj, yaws_k):
        def per_t(t):
            C_world = box[:3] + jnp.array([traj[t, 0], traj[t, 1], 0.0], box.dtype)
            C_trans = C_world - jnp.array(
                [traj_ego[t, 0], traj_ego[t, 1], z_e], box.dtype
            )
            R = jnp.array(
                [
                    [c_e[t], s_e[t], 0.0],
                    [-s_e[t], c_e[t], 0.0],
                    [0.0, 0.0, 1.0],
                ],
                box.dtype,
            )
            C_lidar = R @ C_trans
            return jnp.concatenate(
                [C_lidar, box[3:6], (yaws_k[t] - yaw_ego[t])[None]]
            )

        return jax.vmap(per_t)(jnp.arange(T))

    return jax.vmap(per_obj)(boxes0, traj_obj, yaw_obj)


def compute_inter_frame_transforms(future_xy: np.ndarray, z0: float = 0.0) -> np.ndarray:
    """Homogeneous LiDAR_i → LiDAR_{i+1} transforms; cf. ``common.py:175-225``."""
    future_xy = np.asarray(future_xy, np.float64)
    T1 = future_xy.shape[0]
    offsets = np.vstack([future_xy[:1], future_xy[1:] - future_xy[:-1]])
    yaws = np.arctan2(offsets[:, 1], offsets[:, 0]) - np.pi / 2
    yaws[np.linalg.norm(offsets, axis=1) < 0.1] = 0.0
    poses = [np.eye(4)]
    for i in range(T1):
        c, s = np.cos(yaws[i]), np.sin(yaws[i])
        P = np.eye(4)
        P[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        P[:3, 3] = [future_xy[i, 0], future_xy[i, 1], z0]
        poses.append(P)
    Ms = np.stack([np.linalg.inv(poses[i + 1]) @ poses[i] for i in range(T1)])
    return Ms


# --------------------------------------------------------------- fg/bg split


@partial(jax.jit, static_argnames=("max_points_per_obj",))
def split_foreground_background(
    points: jnp.ndarray,
    point_mask: jnp.ndarray,
    boxes: jnp.ndarray,
    box_mask: jnp.ndarray,
    max_points_per_obj: int = 512,
):
    """Split a padded cloud into background + per-object aligned points.

    cf. ``pipe_related.py:50-68``: per-object points are centered at the box
    and de-rotated (box frame).  Returns
    ``(bg_mask (N,), obj_points (K, P, 4), obj_point_mask (K, P))``.
    """
    N = points.shape[0]
    K = boxes.shape[0]
    member = points_in_boxes(points[:, :3], boxes) & point_mask[None, :] & box_mask[:, None]
    bg_mask = point_mask & (jnp.sum(member, axis=0) == 0)

    def gather(member_k, box):
        # first max_points_per_obj member points, in point order: an
        # ascending argsort of (idx if member else N) puts member indices
        # first, so a slice + gather replaces the former N-update scatter
        # into a P-slot buffer (arbitrary scatters are the slow op on TPU;
        # cf. the same rewrite in ops/projection.py winner selection)
        idx = jnp.arange(N, dtype=jnp.int32)
        take = min(max_points_per_obj, N)
        src = jnp.argsort(jnp.where(member_k, idx, N))[:take]
        msk = member_k[src]
        buf = jnp.where(msk[:, None], points[src], 0.0)
        if take < max_points_per_obj:  # N < P: keep the (P, 4) contract
            pad = max_points_per_obj - take
            buf = jnp.pad(buf, ((0, pad), (0, 0)))
            msk = jnp.pad(msk, (0, pad))
        # align: center at box, de-rotate by yaw
        centered = buf.at[:, :3].add(-box[:3])
        aligned = rotate_points_along_z_jnp(centered[None], -box[6][None])[0]
        aligned = jnp.where(msk[:, None], aligned, 0.0)
        return aligned, msk

    obj_points, obj_mask = jax.vmap(gather)(member, boxes)
    return bg_mask, obj_points, obj_mask


@jax.jit
def replay_objects(
    obj_points: jnp.ndarray,
    obj_point_mask: jnp.ndarray,
    boxes: jnp.ndarray,
    box_mask: jnp.ndarray,
):
    """Place aligned object points at (possibly future) boxes; cf.
    ``pipe_related.py:259-267``.  Returns ((K, P, 4), (K, P)) in lidar frame."""

    def per_obj(pts, msk, box, bm):
        rot = rotate_points_along_z_jnp(pts[None], box[6][None])[0]
        placed = rot.at[:, :3].add(box[:3])
        return placed, msk & bm

    return jax.vmap(per_obj)(obj_points, obj_point_mask, boxes, box_mask)


@jax.jit
def transform_points_homogeneous(points: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4×4 transform to (N, 4) [xyz, intensity]; cf.
    ``pipe_related.py:243-249``."""
    xyz1 = jnp.concatenate(
        [points[:, :3], jnp.ones((points.shape[0], 1), points.dtype)], axis=1
    )
    moved = (T.astype(points.dtype) @ xyz1.T).T
    return jnp.concatenate([moved[:, :3], points[:, 3:4]], axis=1)


@jax.jit
def delete_fg_points_mask(
    points: jnp.ndarray,
    point_mask: jnp.ndarray,
    boxes: jnp.ndarray,
    box_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Mask (not gather) variant of ``pipe_related.delete_fg_points`` (:282-288)."""
    member = points_in_boxes(points[:, :3], boxes) & box_mask[:, None]
    return point_mask & (jnp.sum(member, axis=0) == 0)


@partial(jax.jit, static_argnames=("H", "W"))
def refine_points_via_condition_mask(
    points: jnp.ndarray,
    point_mask: jnp.ndarray,
    boxes_with_class: jnp.ndarray,
    box_mask: jnp.ndarray,
    H: int = 32,
    W: int = 1024,
    min_depth: float = 1.45,
    max_depth: float = 80.0,
    fov_up: float = 10.0,
    fov_down: float = -30.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hidden-surface + box-interior removal through the range image; cf.
    ``pipe_related.refine_next_frame_points`` (:272-281): project the warped
    cloud, zero every pixel covered by a projected box (condition mask > 0),
    and re-extract one point per surviving pixel (norm > 1e-2).

    ``boxes_with_class``: (K, 8) [x y z l w h yaw class]; returns a fixed
    (H·W, 4) cloud + validity mask.
    """
    from ..ops.projection import convert_boxes_to_2d, points_to_range_image

    img = points_to_range_image(
        points, point_mask, H=H, W=W, min_depth=min_depth, max_depth=max_depth,
        fov_up=fov_up, fov_down=fov_down,
    )
    img = img * img[..., 5:6]  # zero invalid pixels (CustomDataset semantics)
    _, condition_mask, _ = convert_boxes_to_2d(
        boxes_with_class, box_mask, H=H, W=W, fov_up=fov_up, fov_down=fov_down
    )
    keep = (condition_mask[..., 0] <= 0)[..., None]
    xyz = img[..., :3] * keep
    inten = img[..., 3:4] * keep
    out = jnp.concatenate([xyz, inten], axis=-1).reshape(-1, 4)
    out_mask = jnp.linalg.norm(out[:, :3], axis=1) > 1e-2
    return out, out_mask
