"""Sparse 3D voxel convolutions (foundation for SPVCNN / MinkowskiNet ports).

The reference's FSVD/FPVD backbones run on torchsparse CUDA kernels
(``lidargen/metrics/models/{spvcnn,minkowskinet}/model.py``).  The TPU-native
formulation: voxels live in a flat (V, C) table with int coordinates; neighbor
lookup is a vectorized binary search over the sorted coordinate keys
(``searchsorted`` — log V steps, fully parallel on the VPU), and each of the
27 kernel taps is one gathered (V, Cin) × (Cin, Cout) matmul on the MXU.

All shapes static: V is the padded voxel budget with a validity mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# int32 keys (x64 is disabled): coordinate range per axis after offsetting is
# limited to 1024 cells — adequate for the eval voxel grids (e.g. 0.1 m voxels
# over +-50 m); larger grids need the x64 key path (planned).
_HASH_BASE = jnp.int32(1024)
_KEY_MAX = jnp.iinfo(jnp.int32).max


def coords_key(coords: jnp.ndarray) -> jnp.ndarray:
    """(V, 3) int coords → sortable int32 keys (coords in [0, 1024) per axis)."""
    c = coords.astype(jnp.int32)
    return (c[:, 0] * _HASH_BASE + c[:, 1]) * _HASH_BASE + c[:, 2]


@partial(jax.jit, static_argnames=("max_voxels",))
def voxelize(
    points: jnp.ndarray,
    voxel_size: float,
    point_mask: jnp.ndarray | None = None,
    max_voxels: int = 65536,
):
    """Quantize a padded cloud to unique voxels (first point per voxel wins,
    torchsparse ``sparse_quantize`` semantics).

    Returns (coords (Vmax, 3) int32, feats_idx (Vmax,) source point index,
    voxel_mask (Vmax,), inverse (N,) point → voxel slot).
    """
    N = points.shape[0]
    if point_mask is None:
        point_mask = jnp.ones((N,), bool)
    vox = jnp.floor(points[:, :3] / voxel_size).astype(jnp.int32)
    vox = vox - jnp.min(jnp.where(point_mask[:, None], vox, 2**30), axis=0)
    key = jnp.where(point_mask, coords_key(vox), _KEY_MAX)
    order = jnp.argsort(key)
    sorted_key = key[order]
    first = jnp.concatenate(
        [jnp.ones(1, bool), sorted_key[1:] != sorted_key[:-1]]
    ) & (sorted_key < _KEY_MAX)
    slot = jnp.cumsum(first) - 1  # voxel slot per sorted point
    V = jnp.sum(first)
    # voxel table
    vmask = jnp.arange(max_voxels) < V
    coords_out = jnp.zeros((max_voxels, 3), jnp.int32)
    src_out = jnp.zeros((max_voxels,), jnp.int32)
    write = jnp.where(first, slot, max_voxels)
    coords_out = coords_out.at[write].set(vox[order], mode="drop")
    src_out = src_out.at[write].set(order.astype(jnp.int32), mode="drop")
    # point → voxel slot (invert the sort); slots past the voxel budget
    # clamp to the last slot so downstream gathers stay in bounds.
    inv = jnp.zeros((N,), jnp.int32).at[order].set(
        jnp.minimum(slot, max_voxels - 1).astype(jnp.int32)
    )
    inv = jnp.where(point_mask, inv, max_voxels - 1)
    return coords_out, src_out, vmask, inv


def _neighbor_lookup(sorted_keys, sorted_idx, query_keys):
    """Binary-search lookup: query key → voxel index (or -1)."""
    pos = jnp.searchsorted(sorted_keys, query_keys)
    pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
    hit = sorted_keys[pos] == query_keys
    return jnp.where(hit, sorted_idx[pos], -1)


@partial(jax.jit, static_argnames=("kernel_size",))
def submanifold_conv3d(
    features: jnp.ndarray,
    coords: jnp.ndarray,
    voxel_mask: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    kernel_size: int = 3,
):
    """Submanifold sparse conv (stride 1, output sites == input sites).

    ``features`` (V, Cin); ``coords`` (V, 3); ``kernel`` (k³, Cin, Cout).
    """
    V = features.shape[0]
    keys = jnp.where(voxel_mask, coords_key(coords), _KEY_MAX)
    order = jnp.argsort(keys)
    sorted_keys = keys[order]
    sorted_idx = order.astype(jnp.int32)

    k = kernel_size
    r = k // 2
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-r, r + 1)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)

    feats_masked = jnp.where(voxel_mask[:, None], features, 0.0)

    def tap(carry, i):
        off = offs[i]
        qkeys = coords_key(coords + off[None])
        qkeys = jnp.where(voxel_mask, qkeys, _KEY_MAX - 1)
        nbr = _neighbor_lookup(sorted_keys, sorted_idx, qkeys)  # (V,)
        valid = nbr >= 0
        gathered = feats_masked[jnp.clip(nbr, 0)] * valid[:, None]
        return carry + jnp.dot(
            gathered, kernel[i], preferred_element_type=jnp.float32
        ), None

    out, _ = jax.lax.scan(
        tap, jnp.zeros((V, kernel.shape[-1]), jnp.float32), jnp.arange(k**3)
    )
    if bias is not None:
        out = out + bias
    return jnp.where(voxel_mask[:, None], out, 0.0)


@partial(jax.jit, static_argnames=("max_voxels",))
def sparse_downsample2(
    features: jnp.ndarray,
    coords: jnp.ndarray,
    voxel_mask: jnp.ndarray,
    kernel: jnp.ndarray,
    max_voxels: int = 65536,
):
    """Stride-2 sparse conv (kernel 2³): output sites = unique(coords // 2);
    each output gathers its up-to-8 child voxels.

    ``kernel`` (8, Cin, Cout).  Returns (out_feats, out_coords, out_mask).
    """
    V = features.shape[0]
    parent = coords // 2
    pkey = jnp.where(voxel_mask, coords_key(parent), _KEY_MAX)
    order = jnp.argsort(pkey)
    skey = pkey[order]
    first = jnp.concatenate([jnp.ones(1, bool), skey[1:] != skey[:-1]]) & (
        skey < _KEY_MAX
    )
    slot = jnp.cumsum(first) - 1
    n_out = jnp.sum(first)
    out_mask = jnp.arange(max_voxels) < n_out
    out_coords = jnp.zeros((max_voxels, 3), jnp.int32)
    write = jnp.where(first, slot, max_voxels)
    out_coords = out_coords.at[write].set(parent[order], mode="drop")

    # child lookup by key
    ckeys = jnp.where(voxel_mask, coords_key(coords), _KEY_MAX)
    corder = jnp.argsort(ckeys)
    csorted = ckeys[corder]
    cidx = corder.astype(jnp.int32)

    feats_masked = jnp.where(voxel_mask[:, None], features, 0.0)
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(2)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)

    def tap(carry, i):
        child = out_coords * 2 + offs[i][None]
        qk = jnp.where(out_mask, coords_key(child), _KEY_MAX - 1)
        nbr = _neighbor_lookup(csorted, cidx, qk)
        valid = nbr >= 0
        gathered = feats_masked[jnp.clip(nbr, 0)] * valid[:, None]
        return carry + jnp.dot(
            gathered, kernel[i], preferred_element_type=jnp.float32
        ), None

    out, _ = jax.lax.scan(
        tap, jnp.zeros((max_voxels, kernel.shape[-1]), jnp.float32), jnp.arange(8)
    )
    return jnp.where(out_mask[:, None], out, 0.0), out_coords, out_mask


@partial(jax.jit, static_argnames=("max_voxels",))
def voxelize_mean(
    points: jnp.ndarray,
    feats: jnp.ndarray,
    voxel_size: float,
    point_mask: jnp.ndarray | None = None,
    max_voxels: int = 65536,
):
    """Quantize a padded cloud to unique voxels with MEAN feature pooling
    (torchsparse ``initial_voxelize`` semantics, ``ts/utils.py:15-33``).

    Returns (vox_feats (Vmax, C), vox_coords (Vmax, 3) int32, vox_mask,
    pts_vox (N, 3) float stride-1 coords, inv (N,) point → voxel slot).
    """
    N = points.shape[0]
    if point_mask is None:
        point_mask = jnp.ones((N,), bool)
    p = points[:, :3] / voxel_size
    # offset so all voxel coords are non-negative (int32 key packing)
    pmin = jnp.floor(jnp.min(jnp.where(point_mask[:, None], p, jnp.inf), axis=0))
    p = p - pmin
    coords, _, vmask, inv = voxelize(
        p, 1.0, point_mask=point_mask, max_voxels=max_voxels
    )
    feats_m = jnp.where(point_mask[:, None], feats, 0.0)
    sums = jax.ops.segment_sum(feats_m, inv, num_segments=max_voxels)
    cnts = jax.ops.segment_sum(
        point_mask.astype(feats.dtype), inv, num_segments=max_voxels
    )
    vox_feats = sums / jnp.maximum(cnts, 1.0)[:, None]
    return jnp.where(vmask[:, None], vox_feats, 0.0), coords, vmask, p, inv


@partial(jax.jit, static_argnames=("level",))
def point_to_voxel_mean(
    pt_feats: jnp.ndarray,
    pts_vox: jnp.ndarray,
    point_mask: jnp.ndarray,
    vox_coords: jnp.ndarray,
    vox_mask: jnp.ndarray,
    level: int = 0,
):
    """Average point features into an EXISTING level-``level`` voxel table
    (torchsparse ``point_to_voxel``, ``ts/utils.py:38-58``).

    ``pts_vox`` are float stride-1 voxel-unit coords (from
    :func:`voxelize_mean`); a point maps to voxel ``floor(p / 2**level)``.
    """
    V = vox_coords.shape[0]
    s = float(2**level)
    pcoord = jnp.floor(pts_vox / s).astype(jnp.int32)
    keys = jnp.where(vox_mask, coords_key(vox_coords), _KEY_MAX)
    order = jnp.argsort(keys)
    slot = _neighbor_lookup(keys[order], order.astype(jnp.int32),
                            jnp.where(point_mask, coords_key(pcoord), _KEY_MAX - 1))
    ok = (slot >= 0) & point_mask
    idx = jnp.where(ok, slot, V)
    feats_m = jnp.where(ok[:, None], pt_feats, 0.0)
    sums = jax.ops.segment_sum(feats_m, idx, num_segments=V + 1)[:V]
    cnts = jax.ops.segment_sum(ok.astype(pt_feats.dtype), idx, num_segments=V + 1)[:V]
    return jnp.where(vox_mask[:, None], sums / jnp.maximum(cnts, 1.0)[:, None], 0.0)


@partial(jax.jit, static_argnames=("level",))
def voxel_to_point_trilinear(
    vox_feats: jnp.ndarray,
    vox_coords: jnp.ndarray,
    vox_mask: jnp.ndarray,
    pts_vox: jnp.ndarray,
    point_mask: jnp.ndarray,
    level: int = 0,
):
    """Trilinear devoxelization: sample level-``level`` voxel features at the
    (stride-1) float point coords (torchsparse ``voxel_to_point`` +
    ``calc_ti_weights``, ``ts/utils.py:63-91``).

    Corner voxels are ``floor(p/s) + {0,1}^3`` with product weights from the
    fractional part; absent corners contribute zero (weights NOT renormalised,
    matching ``spdevoxelize``).
    """
    s = float(2**level)
    p = pts_vox / s
    p0 = jnp.floor(p)
    frac = p - p0
    p0 = p0.astype(jnp.int32)

    keys = jnp.where(vox_mask, coords_key(vox_coords), _KEY_MAX)
    order = jnp.argsort(keys)
    skeys, sidx = keys[order], order.astype(jnp.int32)
    feats_m = jnp.where(vox_mask[:, None], vox_feats, 0.0)

    out = jnp.zeros((pts_vox.shape[0], vox_feats.shape[-1]), vox_feats.dtype)
    for i in range(8):
        off = jnp.array([(i >> 2) & 1, (i >> 1) & 1, i & 1], jnp.int32)
        w = jnp.prod(jnp.where(off[None] == 1, frac, 1.0 - frac), axis=-1)
        qk = jnp.where(point_mask, coords_key(p0 + off[None]), _KEY_MAX - 1)
        nbr = _neighbor_lookup(skeys, sidx, qk)
        hit = nbr >= 0
        out = out + feats_m[jnp.clip(nbr, 0)] * (w * hit)[:, None]
    return jnp.where(point_mask[:, None], out, 0.0)


@jax.jit
def sparse_upsample2(
    features: jnp.ndarray,
    coords_coarse: jnp.ndarray,
    coarse_mask: jnp.ndarray,
    coords_fine: jnp.ndarray,
    fine_mask: jnp.ndarray,
    kernel: jnp.ndarray,
):
    """Stride-2 transposed sparse conv: scatter coarse features to the stored
    fine sites (inverse of :func:`sparse_downsample2`).

    Each fine site at ``c`` reads its parent ``c // 2`` with the kernel tap
    selected by ``c % 2``.  ``kernel`` (8, Cin, Cout).
    """
    ckeys = jnp.where(coarse_mask, coords_key(coords_coarse), _KEY_MAX)
    corder = jnp.argsort(ckeys)
    csorted = ckeys[corder]
    cidx = corder.astype(jnp.int32)
    feats_masked = jnp.where(coarse_mask[:, None], features, 0.0)

    parent = coords_fine // 2
    qk = jnp.where(fine_mask, coords_key(parent), _KEY_MAX - 1)
    nbr = _neighbor_lookup(csorted, cidx, qk)
    valid = (nbr >= 0) & fine_mask
    gathered = feats_masked[jnp.clip(nbr, 0)] * valid[:, None]

    off = coords_fine % 2
    tap = (off[:, 0] * 2 + off[:, 1]) * 2 + off[:, 2]  # ij meshgrid order
    out = jnp.einsum("vc,vco->vo", gathered, kernel[tap])
    return jnp.where(fine_mask[:, None], out, 0.0)
