"""Stacked (variable-length) point-cloud op variants.

Re-designs ``lidargen/ops/pointnet2/pointnet2_stack`` (``pointnet2_utils.py``):
the reference operates on flat stacked clouds with per-batch counts
(``xyz_batch_cnt``) via dedicated CUDA kernels; here the stacked layout is
converted once to the padded-batch layout (static max count + masks) and the
batched ops from :mod:`lidarcrafter_tpu.ops.points` do the work — the natural
XLA formulation of ragged batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import points as P


def stack_to_padded(
    flat: jnp.ndarray, batch_cnt: jnp.ndarray, max_count: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(N_total, C) + (B,) counts → ((B, max_count, C), mask).  Static shapes;
    counts are traced."""
    B = batch_cnt.shape[0]
    offsets = jnp.concatenate([jnp.zeros(1, batch_cnt.dtype), jnp.cumsum(batch_cnt)])[:-1]
    idx = offsets[:, None] + jnp.arange(max_count)[None, :]
    mask = jnp.arange(max_count)[None, :] < batch_cnt[:, None]
    idx = jnp.clip(idx, 0, flat.shape[0] - 1)
    out = flat[idx]
    return jnp.where(mask[..., None], out, 0), mask


def padded_to_stack(padded: jnp.ndarray, mask: jnp.ndarray, total: int) -> jnp.ndarray:
    """Inverse of :func:`stack_to_padded` (padded rows dropped, order kept)."""
    B, M = mask.shape
    flatpos = jnp.cumsum(mask.reshape(-1)) - 1
    pos = jnp.where(mask.reshape(-1), flatpos, total)
    out = jnp.zeros((total, *padded.shape[2:]), padded.dtype)
    return out.at[pos].set(padded.reshape(B * M, *padded.shape[2:]), mode="drop")


@partial(jax.jit, static_argnames=("radius", "nsample", "max_count"))
def stack_ball_query(
    new_xyz: jnp.ndarray,
    new_xyz_batch_cnt: jnp.ndarray,
    xyz: jnp.ndarray,
    xyz_batch_cnt: jnp.ndarray,
    radius: float,
    nsample: int,
    max_count: int = 4096,
) -> jnp.ndarray:
    """cf. ``pointnet2_stack/pointnet2_utils.py:8-50`` (BallQuery): returns
    per-query neighbor indices into the *flat* xyz array."""
    xyz_p, xyz_m = stack_to_padded(xyz, xyz_batch_cnt, max_count)
    q_p, q_m = stack_to_padded(new_xyz, new_xyz_batch_cnt, max_count)
    idx = P.ball_query(q_p, xyz_p, radius, nsample, xyz_m)  # per-batch local idx
    offsets = jnp.concatenate(
        [jnp.zeros(1, xyz_batch_cnt.dtype), jnp.cumsum(xyz_batch_cnt)]
    )[:-1]
    flat_idx = idx + offsets[:, None, None]
    return padded_to_stack(flat_idx, q_m, int(new_xyz.shape[0]))


@partial(jax.jit, static_argnames=("num_samples", "max_count"))
def stack_farthest_point_sampling(
    xyz: jnp.ndarray,
    xyz_batch_cnt: jnp.ndarray,
    num_samples: int,
    max_count: int = 4096,
) -> jnp.ndarray:
    """cf. ``StackFarthestPointSampling`` (:191): per-batch FPS over the
    stacked cloud; returns flat indices (B · num_samples,)."""
    xyz_p, xyz_m = stack_to_padded(xyz, xyz_batch_cnt, max_count)
    idx = P.farthest_point_sampling(xyz_p, num_samples, xyz_m)  # (B, S)
    offsets = jnp.concatenate(
        [jnp.zeros(1, xyz_batch_cnt.dtype), jnp.cumsum(xyz_batch_cnt)]
    )[:-1]
    return (idx + offsets[:, None]).reshape(-1)


@partial(jax.jit, static_argnames=("max_count",))
def stack_three_nn(
    unknown: jnp.ndarray,
    unknown_batch_cnt: jnp.ndarray,
    known: jnp.ndarray,
    known_batch_cnt: jnp.ndarray,
    max_count: int = 4096,
):
    """cf. ``ThreeNN`` (:228): 3 nearest known points per unknown point,
    flat indexing."""
    k_p, k_m = stack_to_padded(known, known_batch_cnt, max_count)
    u_p, u_m = stack_to_padded(unknown, unknown_batch_cnt, max_count)
    dist, idx = P.three_nn(u_p, k_p, k_m)
    offsets = jnp.concatenate(
        [jnp.zeros(1, known_batch_cnt.dtype), jnp.cumsum(known_batch_cnt)]
    )[:-1]
    flat_idx = idx + offsets[:, None, None]
    total = int(unknown.shape[0])
    return (
        padded_to_stack(dist, u_m, total),
        padded_to_stack(flat_idx, u_m, total),
    )
