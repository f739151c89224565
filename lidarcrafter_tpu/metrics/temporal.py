"""Sequence-level metrics: TTCE (ICP ego-motion error) and TCD (temporal CD).

Re-designs ``lidargen/metrics/temporal.py:210-307``: the reference shells out
to Open3D point-to-point ICP; here ICP is a fixed-iteration jitted loop
(chunked nearest neighbor + weighted Procrustes via 3×3 SVD) over padded
clouds, so whole sequences evaluate on-device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.chamfer import chamfer_distance


def _nearest_neighbor(src, tgt, tgt_mask, chunk=1024):
    N = src.shape[0]
    pad = (-N) % chunk
    srcp = jnp.pad(src, ((0, pad), (0, 0)))
    big = jnp.float32(1e10)

    def one(xq):
        d2 = jnp.sum((xq[:, None, :] - tgt[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(tgt_mask[None, :], d2, big)
        return jnp.min(d2, axis=1), jnp.argmin(d2, axis=1)

    d2, idx = jax.lax.map(one, srcp.reshape(-1, chunk, 3))
    return d2.reshape(-1)[:N], idx.reshape(-1)[:N]


@partial(jax.jit, static_argnames=("iters", "threshold"))
def icp_point_to_point(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    src_mask: jnp.ndarray | None = None,
    tgt_mask: jnp.ndarray | None = None,
    threshold: float = 2.0,
    iters: int = 30,
):
    """Point-to-point ICP (Open3D ``registration_icp`` semantics:
    identity init, correspondences within ``threshold``).

    Returns (R (3,3), t (3,)) mapping src → tgt.
    """
    N, M = src.shape[0], tgt.shape[0]
    if src_mask is None:
        src_mask = jnp.ones((N,), bool)
    if tgt_mask is None:
        tgt_mask = jnp.ones((M,), bool)

    def body(_, state):
        R, t = state
        moved = src @ R.T + t
        d2, idx = _nearest_neighbor(moved, tgt, tgt_mask)
        w = (src_mask & (d2 < threshold * threshold)).astype(src.dtype)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        corr = tgt[idx]
        mu_s = jnp.sum(moved * w[:, None], axis=0) / wsum
        mu_t = jnp.sum(corr * w[:, None], axis=0) / wsum
        H = ((moved - mu_s) * w[:, None]).T @ (corr - mu_t)
        U, _, Vt = jnp.linalg.svd(H)
        d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
        D = jnp.diag(jnp.array([1.0, 1.0, 1.0], src.dtype)).at[2, 2].set(d)
        R_step = Vt.T @ D @ U.T
        t_step = mu_t - R_step @ mu_s
        return R_step @ R, R_step @ t + t_step

    R, t = jax.lax.fori_loop(
        0, iters, body, (jnp.eye(3, dtype=src.dtype), jnp.zeros(3, src.dtype))
    )
    return R, t


def relative_gt_transform(source_info: dict, target_info: dict):
    """GT lidar-frame relative transform between two frames; cf.
    ``temporal.py:183-208`` (quaternion chains from nuScenes calib).

    ``*_info``: dicts with lidar2ego_{rotation,translation} (rotation as 3x3
    matrix or quaternion wxyz) and ego2global_{rotation,translation}.
    Returns (R, T) with points_target ≈ points_source @ R + T.
    """

    def rotmat(q):
        q = np.asarray(q, np.float64)
        if q.shape == (3, 3):
            return q
        w, x, y, z = q
        return np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )

    l2e_r_s_mat = rotmat(source_info["lidar2ego_rotation"])
    e2g_r_s_mat = rotmat(source_info["ego2global_rotation"])
    l2e_t_s = np.asarray(source_info["lidar2ego_translation"], np.float64)
    e2g_t_s = np.asarray(source_info["ego2global_translation"], np.float64)
    e2g_r_mat = rotmat(target_info["ego2global_rotation"])
    l2e_r_mat = rotmat(target_info["lidar2ego_rotation"])
    e2g_t = np.asarray(target_info["ego2global_translation"], np.float64)
    l2e_t = np.asarray(target_info["lidar2ego_translation"], np.float64)

    inv = np.linalg.inv
    R = (l2e_r_s_mat.T @ e2g_r_s_mat.T) @ (inv(e2g_r_mat).T @ inv(l2e_r_mat).T)
    T = (l2e_t_s @ e2g_r_s_mat.T + e2g_t_s) @ (inv(e2g_r_mat).T @ inv(l2e_r_mat).T)
    T -= e2g_t @ (inv(e2g_r_mat).T @ inv(l2e_r_mat).T) + l2e_t @ inv(l2e_r_mat).T
    return R.T, T


def ttce_error(t_est: np.ndarray, t_gt: np.ndarray) -> float:
    """cf. ``temporal.py:228``: mean absolute translation error."""
    return float(np.mean(np.abs(np.asarray(t_est) - np.asarray(t_gt))))


def sequence_ttce(frames, infos, splits=(3, 4), threshold: float = 2.0):
    """TTCE over one sequence; cf. ``calculate_single_sequence_TTCE`` (:210-229).

    ``frames``: list of (N_i, 3) clouds (lidar frame); ``infos``: matching list
    of calib dicts.  Returns {split: [errors]}.
    """
    out = {s: [] for s in splits}
    for split in splits:
        for i in range(len(frames) - split):
            R_est, t_est = icp_point_to_point(
                jnp.asarray(frames[i], jnp.float32),
                jnp.asarray(frames[i + split], jnp.float32),
                threshold=threshold,
            )
            _, t_gt = relative_gt_transform(infos[i], infos[i + split])
            out[split].append(ttce_error(np.asarray(t_est), t_gt))
    return out


def sequence_tcd(global_frames, splits=(1, 2, 3, 4)):
    """TCD over one sequence; cf. ``calculate_single_sequence_TCD`` (:231-244):
    symmetric chamfer between frames ``split`` apart, in the global frame."""
    out = {s: [] for s in splits}
    for split in splits:
        for i in range(len(global_frames) - split):
            a = jnp.asarray(global_frames[i], jnp.float32)[None]
            b = jnp.asarray(global_frames[i + split], jnp.float32)[None]
            d1, d2, _, _ = chamfer_distance(a, b)
            out[split].append(float((d1.mean() + d2.mean()) / 2))
    return out
