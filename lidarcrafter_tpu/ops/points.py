"""Irregular point-cloud ops as fixed-shape jitted lax code (TPU-native L0 layer).

Re-designs the reference's CUDA kernels (SURVEY.md §2.1) with static padded
shapes + validity masks — no Python stand-ins, no dynamic shapes:

- ``points_in_boxes``      ↔ roiaware_pool3d (``src/roiaware_pool3d_kernel.cu``
                             ``check_pt_in_box3d``: box [x,y,z,dx,dy,dz,rz],
                             z-centered, margin 1e-5)
- ``farthest_point_sampling`` ↔ pointnet2 ``sampling_gpu.cu`` (start at index 0,
                             running min-dist, first-argmax tie-break)
- ``ball_query``           ↔ pointnet2 ``ball_query_gpu.cu`` (first ``nsample``
                             in index order within radius; empty slots filled
                             with the first in-radius index, else 0)
- ``three_nn`` / ``three_interpolate`` ↔ pointnet2 ``interpolate_gpu.cu``
- ``gather_points`` / ``group_points``  ↔ pointnet2 gather/grouping

All are batched with ``vmap`` and O(M·N) dense-masked — the idiomatic TPU
formulation (regular compute beats data-dependent branching on this hardware).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------- boxes

def _points_in_boxes_single(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) points × (M, 7) boxes → (M, N) bool membership."""
    shift = points[None, :, :3] - boxes[:, None, :3]  # (M, N, 3)
    rz = boxes[:, 6]
    cosa, sina = jnp.cos(-rz), jnp.sin(-rz)
    local_x = shift[..., 0] * cosa[:, None] - shift[..., 1] * sina[:, None]
    local_y = shift[..., 0] * sina[:, None] + shift[..., 1] * cosa[:, None]
    margin = 1e-5
    in_z = jnp.abs(shift[..., 2]) <= boxes[:, None, 5] / 2.0
    in_x = jnp.abs(local_x) < boxes[:, None, 3] / 2.0 + margin
    in_y = jnp.abs(local_y) < boxes[:, None, 4] / 2.0 + margin
    return in_z & in_x & in_y


@jax.jit
def points_in_boxes(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Rotated-box membership; cf. ``roiaware_pool3d_utils.points_in_boxes_cpu``.

    ``points``: (..., N, 3); ``boxes``: (..., M, 7) [x,y,z,dx,dy,dz,heading]
    (z = box center).  Returns (..., M, N) bool.
    """
    fn = _points_in_boxes_single
    for _ in range(points.ndim - 2):
        fn = jax.vmap(fn)
    return fn(points, boxes)


# ----------------------------------------------------------------- sampling

def _fps_single(xyz: jnp.ndarray, num_samples: int, mask: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) → (num_samples,) int32 indices.  Matches ``sampling_gpu.cu``:
    start at index 0, iteratively take the point with max running min-distance.
    Padded (masked-out) points never win (distance forced to -1).
    """
    N = xyz.shape[0]
    min_d = jnp.full((N,), 1e10, jnp.float32)

    def body(carry, _):
        min_d, last = carry
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        cand = jnp.where(mask, min_d, -1.0)
        nxt = jnp.argmax(cand).astype(jnp.int32)
        return (min_d, nxt), nxt

    (_, _), idx = jax.lax.scan(
        body, (min_d, jnp.int32(0)), None, length=num_samples - 1
    )
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), idx])


@partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sampling(
    xyz: jnp.ndarray, num_samples: int, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """FPS; cf. ``pointnet2_batch/pointnet2_utils.py:10`` (FarthestPointSampling).

    ``xyz``: (B, N, 3) → (B, num_samples) indices.
    """
    B, N, _ = xyz.shape
    if mask is None:
        mask = jnp.ones((B, N), bool)
    return jax.vmap(lambda x, m: _fps_single(x, num_samples, m))(xyz, mask)


# ----------------------------------------------------------------- neighbors

def _ball_query_single(
    new_xyz: jnp.ndarray,
    xyz: jnp.ndarray,
    radius: float,
    nsample: int,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """(M, 3) queries × (N, 3) points → (M, nsample) indices."""
    d2 = jnp.sum((new_xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)  # (M, N)
    hit = (d2 < radius * radius) & mask[None, :]
    # slot for each hit = number of prior hits along N (index order)
    slot = jnp.cumsum(hit, axis=1) - 1  # (M, N)
    take = hit & (slot < nsample)
    # scatter point index k into (M, nsample); empty → first hit (or 0)
    N = xyz.shape[0]
    k_ids = jnp.arange(N, dtype=jnp.int32)
    first_hit = jnp.argmax(hit, axis=1).astype(jnp.int32)  # 0 if no hit
    out = jnp.broadcast_to(first_hit[:, None], (new_xyz.shape[0], nsample))
    scat_cols = jnp.where(take, slot, nsample)  # out-of-range → dropped
    out = jax.vmap(
        lambda o, cols, t: o.at[jnp.where(t, cols, nsample)].set(
            jnp.where(t, k_ids, 0), mode="drop"
        )
    )(out, scat_cols, take)
    return out


@partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query(
    new_xyz: jnp.ndarray,
    xyz: jnp.ndarray,
    radius: float,
    nsample: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """cf. ``pointnet2_batch/pointnet2_utils.py:200`` (BallQuery).

    (B, M, 3) × (B, N, 3) → (B, M, nsample) int32.
    """
    B, N, _ = xyz.shape
    if mask is None:
        mask = jnp.ones((B, N), bool)
    return jax.vmap(
        lambda q, x, m: _ball_query_single(q, x, radius, nsample, m)
    )(new_xyz, xyz, mask)


@partial(jax.jit, static_argnames=("k",))
def knn(
    new_xyz: jnp.ndarray, xyz: jnp.ndarray, k: int, mask: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors: (B, M, 3) × (B, N, 3) → dists² (B, M, k), idx.

    Masked points get +inf distance.
    """
    B, N, _ = xyz.shape
    if mask is None:
        mask = jnp.ones((B, N), bool)
    d2 = jnp.sum((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(mask[:, None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx.astype(jnp.int32)


def three_nn(new_xyz: jnp.ndarray, xyz: jnp.ndarray, mask=None):
    """cf. ``pointnet2_batch/pointnet2_utils.py:76`` (ThreeNN): returns
    (dist (B,M,3), idx (B,M,3)) — note dist is sqrt of squared distance."""
    d2, idx = knn(new_xyz, xyz, 3, mask)
    return jnp.sqrt(d2), idx


@jax.jit
def three_interpolate(
    features: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """cf. ``ThreeInterpolate`` (:108): features (B, C, N), idx/weight (B, M, 3)
    → (B, C, M) = Σ_k w_k · f[:, idx_k]."""
    gathered = jax.vmap(lambda f, i: f[:, i])(features, idx)  # (B, C, M, 3)
    return jnp.sum(gathered * weight[:, None, :, :], axis=-1)


def interpolation_weights(dist: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse-distance weights used with ``three_interpolate``
    (cf. ``pointnet2_modules.py`` usage): w = (1/d) / Σ(1/d)."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


@jax.jit
def gather_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """cf. ``GatherOperation`` (:39): (B, C, N) × (B, M) → (B, C, M)."""
    return jax.vmap(lambda f, i: f[:, i])(features, idx)


@jax.jit
def group_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """cf. ``GroupingOperation`` (:156): (B, C, N) × (B, M, K) → (B, C, M, K)."""
    return jax.vmap(lambda f, i: f[:, i])(features, idx)


def query_and_group(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    features: jnp.ndarray | None,
    radius: float,
    nsample: int,
    use_xyz: bool = True,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """cf. ``QueryAndGroup`` (:231): ball query + grouping with centered xyz.

    Returns (B, 3[+C], M, nsample).
    """
    idx = ball_query(new_xyz, xyz, radius, nsample, mask)
    grouped_xyz = group_points(jnp.swapaxes(xyz, 1, 2), idx)  # (B, 3, M, K)
    grouped_xyz = grouped_xyz - jnp.swapaxes(new_xyz, 1, 2)[..., None]
    if features is None:
        return grouped_xyz
    grouped = group_points(features, idx)  # (B, C, M, K)
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped], axis=1)
    return grouped
