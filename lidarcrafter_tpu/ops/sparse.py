"""Sparse 3D voxel convolutions (foundation for SPVCNN / MinkowskiNet ports).

The reference's FSVD/FPVD backbones run on torchsparse CUDA kernels
(``lidargen/metrics/models/{spvcnn,minkowskinet}/model.py``).  The TPU-native
formulation: voxels live in a flat (V, C) table with int coordinates; neighbor
lookup is a vectorized binary search over lexicographically sorted coordinate
keys (log V steps, fully parallel on the VPU), and each of the 27 kernel taps
is one gathered (V, Cin) × (Cin, Cout) matmul on the MXU.

Coordinate keys are (hi, lo) int32 PAIRS — hi = x, lo = y·2¹⁵ + z — compared
lexicographically, so grids up to 2³¹ × 32767 × 32767 cells are exact with x64
disabled.  (nuScenes extents ±80 m at the 0.05 m eval voxel size need 3,200
cells/axis; the old single-int32 packing capped at 1,024 and would silently
collide.)

All shapes static: V is the padded voxel budget with a validity mask.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

# lo-key packing base for (y, z): y and z must stay in [-_LO_BASE, _LO_BASE),
# which keeps lo = y·_LO_BASE + z injective for the ±1-cell neighbor offsets
# the conv taps generate.  Grid limit: 32767 cells along y and z, 2³¹ along x.
_LO_BASE = jnp.int32(1 << 15)
_KEY_MAX = jnp.iinfo(jnp.int32).max


def coords_key(coords: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(V, 3) int coords → lexicographic (hi, lo) int32 key pair.

    Valid voxel coords are non-negative (offset upstream); query coords may
    stray ±1 outside the grid and simply never match a stored key.
    """
    c = coords.astype(jnp.int32)
    return c[:, 0], c[:, 1] * _LO_BASE + c[:, 2]


def _masked_keys(coords: jnp.ndarray, mask: jnp.ndarray, sentinel=None):
    hi, lo = coords_key(coords)
    s = _KEY_MAX if sentinel is None else sentinel
    return jnp.where(mask, hi, s), jnp.where(mask, lo, s)


def _lex_argsort(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """argsort by (hi, lo) lexicographically."""
    return jnp.lexsort((lo, hi))


def _pair_less(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al < bl))


def _lower_bound_pair(shi, slo, qhi, qlo):
    """Vectorized lower_bound over a lexicographically sorted (hi, lo) table:
    fixed ⌈log₂(V+1)⌉ gather+compare steps (binary search on the VPU)."""
    V = shi.shape[0]
    steps = max(1, math.ceil(math.log2(V + 1)))
    lo_b = jnp.zeros(qhi.shape, jnp.int32)
    hi_b = jnp.full(qhi.shape, V, jnp.int32)

    def body(_, state):
        lo_b, hi_b = state
        mid = (lo_b + hi_b) // 2
        midc = jnp.clip(mid, 0, V - 1)
        less = _pair_less(shi[midc], slo[midc], qhi, qlo)
        return jnp.where(less, mid + 1, lo_b), jnp.where(less, hi_b, mid)

    lo_b, _ = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
    return lo_b


def _neighbor_lookup(shi, slo, sorted_idx, qhi, qlo):
    """(hi, lo) query keys → voxel index in the original table (or -1)."""
    V = shi.shape[0]
    pos = _lower_bound_pair(shi, slo, qhi, qlo)
    posc = jnp.clip(pos, 0, V - 1)
    hit = (pos < V) & (shi[posc] == qhi) & (slo[posc] == qlo)
    return jnp.where(hit, sorted_idx[posc], -1)


def _sorted_key_table(coords: jnp.ndarray, mask: jnp.ndarray):
    """Sorted (hi, lo) keys + original-index table for lookups."""
    hi, lo = _masked_keys(coords, mask)
    order = _lex_argsort(hi, lo)
    return hi[order], lo[order], order.astype(jnp.int32)


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
    hi, lo = _masked_keys(vox, point_mask)
    order = _lex_argsort(hi, lo)
    shi, slo = hi[order], lo[order]
    first = jnp.concatenate(
        [jnp.ones(1, bool), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])]
    ) & (shi < _KEY_MAX)
    slot = jnp.cumsum(first) - 1  # voxel slot per sorted point
    V = jnp.sum(first)
    # voxel table
    # overflow = silent truncation of the key-order tail: slots are
    # contiguous from 0, so when V > max_voxels every kept row HAS been
    # written (writes for slots >= max_voxels drop); arange < V marks
    # exactly the written rows either way
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
    shi, slo, sidx = _sorted_key_table(coords, voxel_mask)

    k = kernel_size
    r = k // 2
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-r, r + 1)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)

    feats_masked = jnp.where(voxel_mask[:, None], features, 0.0)

    def tap(carry, i):
        off = offs[i]
        qhi, qlo = coords_key(coords + off[None])
        qhi = jnp.where(voxel_mask, qhi, _KEY_MAX - 1)
        qlo = jnp.where(voxel_mask, qlo, _KEY_MAX - 1)
        nbr = _neighbor_lookup(shi, slo, sidx, qhi, qlo)  # (V,)
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
    phi, plo = _masked_keys(parent, voxel_mask)
    order = _lex_argsort(phi, plo)
    shi_p, slo_p = phi[order], plo[order]
    first = jnp.concatenate(
        [jnp.ones(1, bool), (shi_p[1:] != shi_p[:-1]) | (slo_p[1:] != slo_p[:-1])]
    ) & (shi_p < _KEY_MAX)
    slot = jnp.cumsum(first) - 1
    n_out = jnp.sum(first)
    # slots are contiguous from 0: rows < max_voxels are always written,
    # so overflow (n_out > max_voxels) truncates the tail, never marks
    # unwritten rows valid
    out_mask = jnp.arange(max_voxels) < n_out
    out_coords = jnp.zeros((max_voxels, 3), jnp.int32)
    write = jnp.where(first, slot, max_voxels)
    out_coords = out_coords.at[write].set(parent[order], mode="drop")

    # child lookup by key
    chi, clo, cidx = _sorted_key_table(coords, voxel_mask)

    feats_masked = jnp.where(voxel_mask[:, None], features, 0.0)
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(2)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)

    def tap(carry, i):
        child = out_coords * 2 + offs[i][None]
        qhi, qlo = coords_key(child)
        qhi = jnp.where(out_mask, qhi, _KEY_MAX - 1)
        qlo = jnp.where(out_mask, qlo, _KEY_MAX - 1)
        nbr = _neighbor_lookup(chi, clo, cidx, qhi, qlo)
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
    # offset so all voxel coords are non-negative (key packing)
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
    shi, slo, sidx = _sorted_key_table(vox_coords, vox_mask)
    qhi, qlo = _masked_keys(pcoord, point_mask, sentinel=_KEY_MAX - 1)
    slot = _neighbor_lookup(shi, slo, sidx, qhi, qlo)
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
    fractional part; absent corners get weight 0 and the surviving weights
    are renormalised by their sum (+1e-8), matching ``calc_ti_weights``'
    ``w[idx==-1]=0; w /= sum(w)+1e-8`` — a boundary point interpolates only
    from the corners that exist instead of being attenuated.
    """
    s = float(2**level)
    p = pts_vox / s
    p0 = jnp.floor(p)
    frac = p - p0
    p0 = p0.astype(jnp.int32)

    shi, slo, sidx = _sorted_key_table(vox_coords, vox_mask)
    feats_m = jnp.where(vox_mask[:, None], vox_feats, 0.0)

    out = jnp.zeros((pts_vox.shape[0], vox_feats.shape[-1]), vox_feats.dtype)
    wsum = jnp.zeros((pts_vox.shape[0],), vox_feats.dtype)
    for i in range(8):
        off = jnp.array([(i >> 2) & 1, (i >> 1) & 1, i & 1], jnp.int32)
        w = jnp.prod(jnp.where(off[None] == 1, frac, 1.0 - frac), axis=-1)
        qhi, qlo = _masked_keys(p0 + off[None], point_mask, sentinel=_KEY_MAX - 1)
        nbr = _neighbor_lookup(shi, slo, sidx, qhi, qlo)
        hit = nbr >= 0
        w = w * hit
        out = out + feats_m[jnp.clip(nbr, 0)] * w[:, None]
        wsum = wsum + w
    out = out / (wsum + 1e-8)[:, None]
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
    chi, clo, cidx = _sorted_key_table(coords_coarse, coarse_mask)
    feats_masked = jnp.where(coarse_mask[:, None], features, 0.0)

    parent = coords_fine // 2
    qhi, qlo = _masked_keys(parent, fine_mask, sentinel=_KEY_MAX - 1)
    nbr = _neighbor_lookup(chi, clo, cidx, qhi, qlo)
    valid = (nbr >= 0) & fine_mask
    gathered = feats_masked[jnp.clip(nbr, 0)] * valid[:, None]

    off = coords_fine % 2
    tap = (off[:, 0] * 2 + off[:, 1]) * 2 + off[:, 2]  # ij meshgrid order
    out = jnp.einsum("vc,vco->vo", gathered, kernel[tap])
    return jnp.where(fine_mask[:, None], out, 0.0)


@partial(
    jax.jit,
    static_argnames=("kernel_size", "stride", "padding", "max_voxels", "out_spatial"),
)
def sparse_conv3d_strided(
    features: jnp.ndarray,
    coords: jnp.ndarray,
    voxel_mask: jnp.ndarray,
    kernel: jnp.ndarray,
    kernel_size: tuple[int, int, int] = (3, 3, 3),
    stride: tuple[int, int, int] = (2, 2, 2),
    padding: tuple[int, int, int] = (1, 1, 1),
    max_voxels: int = 65536,
    out_spatial: tuple[int, int, int] | None = None,
):
    """Regular (non-submanifold) strided sparse conv with spconv output-site
    semantics (``spconv.SparseConv3d``): output sites are every position the
    kernel window reaches from an active input —
    ``o·s − p + t = i`` for some tap ``t ∈ [0, k)`` — clamped to the output
    spatial shape ``(in + 2p − k)//s + 1`` when ``out_spatial`` (per input
    axis dims) is given.  spconv enforces this bound; without it, boundary
    voxels on even grids spawn phantom sites one past the grid edge.

    This is the downsampling conv of pcdet's ``VoxelBackBone8x``
    (kernel 3, stride 2, padding 1 between stages; ``conv_out`` kernel
    (3,1,1), stride (2,1,1), padding 0).  ``kernel``: (∏k, Cin, Cout), taps in
    ``ij``-meshgrid order.  Returns (out_feats, out_coords, out_mask).
    """
    V = features.shape[0]
    k, s, p = kernel_size, stride, padding
    if out_spatial is not None:
        out_dims = tuple(
            (out_spatial[ax] + 2 * p[ax] - k[ax]) // s[ax] + 1 for ax in range(3)
        )
    else:
        out_dims = None

    # per-axis candidate output coords per input voxel: o = (i + p − t)/s
    def axis_cands(i, ax):
        outs = []
        for t in range(k[ax]):
            num = i + p[ax] - t
            ok = (num % s[ax] == 0) & (num >= 0)
            if out_dims is not None:
                ok &= num // s[ax] < out_dims[ax]
            outs.append((num // s[ax], ok))
        return outs

    cand_list = []
    for cx, okx in axis_cands(coords[:, 0], 0):
        for cy, oky in axis_cands(coords[:, 1], 1):
            for cz, okz in axis_cands(coords[:, 2], 2):
                c = jnp.stack([cx, cy, cz], axis=1)
                ok = okx & oky & okz & voxel_mask
                cand_list.append((c, ok))
    # dedup candidates per axis (k=3,s=2 yields duplicate (i+p−t)/s values)
    cands = jnp.concatenate([c for c, _ in cand_list], axis=0)
    cmask = jnp.concatenate([m for _, m in cand_list], axis=0)

    hi, lo = _masked_keys(cands, cmask)
    order = _lex_argsort(hi, lo)
    shi, slo = hi[order], lo[order]
    first = jnp.concatenate(
        [jnp.ones(1, bool), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])]
    ) & (shi < _KEY_MAX)
    slot = jnp.cumsum(first) - 1
    n_out = jnp.sum(first)
    # slots are contiguous from 0: rows < max_voxels are always written,
    # so overflow (n_out > max_voxels) truncates the tail, never marks
    # unwritten rows valid
    out_mask = jnp.arange(max_voxels) < n_out
    out_coords = jnp.zeros((max_voxels, 3), jnp.int32)
    write = jnp.where(first, slot, max_voxels)
    out_coords = out_coords.at[write].set(cands[order], mode="drop")

    # gather taps: input coord = o·s − p + t
    ihi, ilo, iidx = _sorted_key_table(coords, voxel_mask)
    feats_masked = jnp.where(voxel_mask[:, None], features, 0.0)
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(k[0]), jnp.arange(k[1]), jnp.arange(k[2]), indexing="ij"
        ),
        axis=-1,
    ).reshape(-1, 3)
    svec = jnp.asarray(s, jnp.int32)
    pvec = jnp.asarray(p, jnp.int32)

    def tap(carry, i):
        src = out_coords * svec[None] - pvec[None] + offs[i][None]
        qhi, qlo = coords_key(src)
        qhi = jnp.where(out_mask, qhi, _KEY_MAX - 1)
        qlo = jnp.where(out_mask, qlo, _KEY_MAX - 1)
        nbr = _neighbor_lookup(ihi, ilo, iidx, qhi, qlo)
        valid = nbr >= 0
        gathered = feats_masked[jnp.clip(nbr, 0)] * valid[:, None]
        return carry + jnp.dot(
            gathered, kernel[i], preferred_element_type=jnp.float32
        ), None

    out, _ = jax.lax.scan(
        tap,
        jnp.zeros((max_voxels, kernel.shape[-1]), jnp.float32),
        jnp.arange(offs.shape[0]),
    )
    return jnp.where(out_mask[:, None], out, 0.0), out_coords, out_mask


@partial(jax.jit, static_argnames=("max_voxels",))
def voxelize_coords_mean(
    coords_int: jnp.ndarray,
    feats: jnp.ndarray,
    point_mask: jnp.ndarray,
    max_voxels: int = 65536,
):
    """Unique-voxel table with MEAN feature pooling over PRE-QUANTIZED int
    coords (no re-anchoring — for fixed detection grids where coords are
    already ``floor((p − range_min)/voxel_size)``; pcdet MeanVFE semantics).

    Returns (vox_feats (Vmax, C), vox_coords (Vmax, 3) int32, vox_mask).
    """
    N = coords_int.shape[0]
    hi, lo = _masked_keys(coords_int, point_mask)
    order = _lex_argsort(hi, lo)
    shi, slo = hi[order], lo[order]
    first = jnp.concatenate(
        [jnp.ones(1, bool), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])]
    ) & (shi < _KEY_MAX)
    slot = jnp.cumsum(first) - 1
    V = jnp.sum(first)
    # overflow = silent truncation of the key-order tail: slots are
    # contiguous from 0, so when V > max_voxels every kept row HAS been
    # written (writes for slots >= max_voxels drop); arange < V marks
    # exactly the written rows either way
    vmask = jnp.arange(max_voxels) < V
    coords_out = jnp.zeros((max_voxels, 3), jnp.int32)
    write = jnp.where(first, slot, max_voxels)
    coords_out = coords_out.at[write].set(coords_int[order], mode="drop")
    inv = jnp.zeros((N,), jnp.int32).at[order].set(
        jnp.minimum(slot, max_voxels - 1).astype(jnp.int32)
    )
    idx = jnp.where(point_mask, inv, max_voxels)
    feats_m = jnp.where(point_mask[:, None], feats, 0.0)
    sums = jax.ops.segment_sum(feats_m, idx, num_segments=max_voxels + 1)[:max_voxels]
    cnts = jax.ops.segment_sum(
        point_mask.astype(feats.dtype), idx, num_segments=max_voxels + 1
    )[:max_voxels]
    vox_feats = sums / jnp.maximum(cnts, 1.0)[:, None]
    return jnp.where(vmask[:, None], vox_feats, 0.0), coords_out, vmask
