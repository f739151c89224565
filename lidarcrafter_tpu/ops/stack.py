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


def voxel_indices_grid(
    coords_bzyx: jnp.ndarray,
    grid_shape: tuple[int, int, int, int],
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(N, 4) [b, z, y, x] voxel coords → dense (B, Z, Y, X) int32 grid of
    flat point/voxel row indices (-1 = empty); the ``voxel2point_indices``
    input of the reference's voxel query
    (``pointnet2_stack/voxel_query_utils.py:13-47``)."""
    N = coords_bzyx.shape[0]
    if mask is None:
        mask = jnp.ones((N,), bool)
    B, Z, Y, X = grid_shape
    c = coords_bzyx.astype(jnp.int32)
    inb = (
        mask
        & (c[:, 0] >= 0) & (c[:, 0] < B)
        & (c[:, 1] >= 0) & (c[:, 1] < Z)
        & (c[:, 2] >= 0) & (c[:, 2] < Y)
        & (c[:, 3] >= 0) & (c[:, 3] < X)
    )
    flat = ((c[:, 0] * Z + c[:, 1]) * Y + c[:, 2]) * X + c[:, 3]
    flat = jnp.where(inb, flat, B * Z * Y * X)
    grid = jnp.full((B * Z * Y * X,), -1, jnp.int32)
    grid = grid.at[flat].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    return grid.reshape(B, Z, Y, X)


@partial(jax.jit, static_argnames=("query_range", "radius", "nsample"))
def voxel_query(
    new_coords_bzyx: jnp.ndarray,
    new_xyz: jnp.ndarray,
    xyz: jnp.ndarray,
    point_indices: jnp.ndarray,
    query_range: tuple[int, int, int] = (1, 1, 1),
    radius: float = 1.0,
    nsample: int = 16,
    new_mask: jnp.ndarray | None = None,
):
    """Voxel-neighborhood ball query (``voxel_query_gpu.cu`` kernel,
    ``voxel_query_utils.py:10-47``): for each keypoint, scan the static
    (2*zr+1)x(2*yr+1)x(2*xr+1) voxel window around its coord in dz,dy,dx
    order, gather the grid's point index, keep the first ``nsample`` within
    ``radius``; empty windows fill with the first hit (kernel lines 69-75)
    and flag ``empty_mask``.

    Returns (idx (M, nsample) FLAT rows into the stacked ``xyz`` — the
    reference converts to per-batch indices for its grouping op, ours gather
    directly — and empty_mask (M,)).
    """
    import numpy as np

    M = new_coords_bzyx.shape[0]
    if new_mask is None:
        new_mask = jnp.ones((M,), bool)
    B, Z, Y, X = point_indices.shape
    zr, yr, xr = query_range
    offs = np.array(
        [
            (dz, dy, dx)
            for dz in range(-zr, zr + 1)
            for dy in range(-yr, yr + 1)
            for dx in range(-xr, xr + 1)
        ],
        np.int32,
    )
    c = new_coords_bzyx[:, 1:].astype(jnp.int32)[:, None, :] + offs[None]  # (M,K,3)
    b = new_coords_bzyx[:, 0].astype(jnp.int32)
    inb = (
        (c[..., 0] >= 0) & (c[..., 0] < Z)
        & (c[..., 1] >= 0) & (c[..., 1] < Y)
        & (c[..., 2] >= 0) & (c[..., 2] < X)
        & new_mask[:, None]
    )
    flat = ((b[:, None] * Z + c[..., 0]) * Y + c[..., 1]) * X + c[..., 2]
    nbr = jnp.where(inb, point_indices.reshape(-1)[jnp.clip(flat, 0)], -1)
    d2 = jnp.sum(
        (xyz[jnp.clip(nbr, 0)] - new_xyz[:, None, :]) ** 2, axis=-1
    )
    valid = (nbr >= 0) & (d2 <= radius * radius) & inb

    cnt = jnp.cumsum(valid, axis=1)
    slot = jnp.where(valid & (cnt <= nsample), cnt - 1, nsample)
    first_pos = jnp.argmax(valid, axis=1)
    first_val = jnp.take_along_axis(nbr, first_pos[:, None], axis=1)[:, 0]
    empty_mask = ~jnp.any(valid, axis=1)
    fill = jnp.where(empty_mask, 0, first_val)
    out = jnp.broadcast_to(fill[:, None], (M, nsample + 1)).astype(jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(M)[:, None], slot.shape)
    out = out.at[rows, slot].set(nbr.astype(jnp.int32), mode="drop")
    return out[:, :nsample], empty_mask


@partial(
    jax.jit,
    static_argnames=(
        "num_grid", "num_c_each", "use_xyz", "neighbor_type", "nsample", "chunk"
    ),
)
def vector_pool(
    support_xyz: jnp.ndarray,
    support_feats: jnp.ndarray,
    support_mask: jnp.ndarray,
    new_xyz: jnp.ndarray,
    new_mask: jnp.ndarray,
    num_grid: tuple[int, int, int] = (3, 3, 3),
    max_neighbour_distance: float = 1.0,
    num_c_each: int = 8,
    use_xyz: bool = True,
    neighbor_type: int = 0,
    nsample: int = -1,
    chunk: int = 256,
):
    """PV-RCNN++ vector pooling (``vector_pool_kernel_stack``,
    ``pointnet2_stack/src/vector_pool_gpu.cu:243-345`` via
    ``VectorPoolWithVoxelQuery``, ``pointnet2_utils.py:360-453``).

    Each center's local cube ``[-d, d]^3`` splits into ``gx*gy*gz`` sub-voxels;
    neighbors (cube if ``neighbor_type`` 0, ball if 1; first ``nsample`` in
    point order when >0) average their features per sub-voxel with input
    channels folded modulo ``num_c_each`` (kernel line 326).

    Returns (new_features (M, G*num_c_each), new_local_xyz (M, G*3),
    point_cnt (M, G)) — averaged like the python wrapper's normalizer.
    """
    gx, gy, gz = num_grid
    G = gx * gy * gz
    d = max_neighbour_distance
    N, C = support_feats.shape
    M = new_xyz.shape[0]
    k_fold = C // num_c_each
    folded = jnp.where(
        support_mask[:, None],
        support_feats.reshape(N, k_fold, num_c_each).sum(1),
        0.0,
    )
    gsx, gsy, gsz = 2 * d / gx, 2 * d / gy, 2 * d / gz

    def one_block(args):
        nx, nm = args  # (Mb, 3), (Mb,)
        local = support_xyz[None] - nx[:, None]          # (Mb, N, 3)
        if neighbor_type == 1:
            near = jnp.sum(local**2, -1) <= d * d
        else:
            near = jnp.all(jnp.abs(local) <= d, -1)
        near = near & support_mask[None] & nm[:, None]
        if nsample > 0:
            near = near & (jnp.cumsum(near, axis=1) <= nsample)
        gi = (
            jnp.floor((local[..., 0] + d) / gsx).astype(jnp.int32) * (gy * gz)
            + jnp.floor((local[..., 1] + d) / gsy).astype(jnp.int32) * gz
            + jnp.floor((local[..., 2] + d) / gsz).astype(jnp.int32)
        )
        gi = jnp.clip(gi, 0, G - 1)
        Mb = nx.shape[0]
        seg = jnp.where(near, jnp.arange(Mb)[:, None] * G + gi, Mb * G)
        seg = seg.reshape(-1)
        feats = jnp.broadcast_to(folded[None], (Mb, N, num_c_each)).reshape(-1, num_c_each)
        feats = feats * near.reshape(-1, 1)
        sums = jax.ops.segment_sum(feats, seg, num_segments=Mb * G + 1)[:-1]
        cnts = jax.ops.segment_sum(
            near.reshape(-1).astype(jnp.float32), seg, num_segments=Mb * G + 1
        )[:-1]
        lxyz = jax.ops.segment_sum(
            (local * near[..., None]).reshape(-1, 3), seg, num_segments=Mb * G + 1
        )[:-1]
        norm = jnp.maximum(cnts, 1e-6)[:, None]
        return (
            (sums / norm).reshape(Mb, G * num_c_each),
            ((lxyz / norm) if use_xyz else lxyz).reshape(Mb, G * 3),
            cnts.reshape(Mb, G),
        )

    pad = (-M) % chunk
    nxp = jnp.pad(new_xyz, ((0, pad), (0, 0)))
    nmp = jnp.pad(new_mask, (0, pad))
    nb = (M + pad) // chunk
    feats_o, lxyz_o, cnt_o = jax.lax.map(
        one_block, (nxp.reshape(nb, chunk, 3), nmp.reshape(nb, chunk))
    )
    return (
        feats_o.reshape(-1, G * num_c_each)[:M],
        lxyz_o.reshape(-1, G * 3)[:M],
        cnt_o.reshape(-1, G)[:M],
    )
