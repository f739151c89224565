"""RangeNet kNN label cleanup — point-level vote over range-image neighbors.

Re-designs ``lidargen/metrics/models/rangenet/postproc/KNN.py:36-141``: each
3D point gathers the S×S range-image window at its projected pixel, weights
|range − neighbor range| by an inverted Gaussian spatial kernel, takes the K
nearest neighbors, and votes their predicted classes (with an optional range
cutoff marking votes invalid).  The reference materialises full ``F.unfold``
matrices (S²·H·W); here each point gathers only its own window — P·S² loads,
no unfold tensor.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def inv_gaussian_window(search: int, sigma: float) -> np.ndarray:
    """1 − normalized 2D Gaussian, flattened (S²,); cf. ``KNN.py:11-33,100``."""
    coords = np.arange(search, dtype=np.float64)
    mean = (search - 1) / 2.0
    g = np.exp(-((coords[:, None] - mean) ** 2 + (coords[None, :] - mean) ** 2)
               / (2.0 * sigma**2))
    g = g / (2.0 * np.pi * sigma**2)
    g = g / g.sum()
    return (1.0 - g).reshape(-1).astype(np.float32)


@partial(jax.jit, static_argnames=("knn", "search", "sigma", "cutoff", "nclasses"))
def knn_postprocess(
    proj_range: jnp.ndarray,
    unproj_range: jnp.ndarray,
    proj_argmax: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    knn: int = 5,
    search: int = 5,
    sigma: float = 1.0,
    cutoff: float = 1.0,
    nclasses: int = 17,
) -> jnp.ndarray:
    """(H, W) range + argmax images, per-point ranges and pixel coords →
    cleaned per-point labels (P,).  Matches ``KNN.forward`` exactly."""
    H, W = proj_range.shape
    pad = (search - 1) // 2
    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(search) - pad, jnp.arange(search) - pad,
                     indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)  # (S², [dy, dx]) — unfold's row-major window order

    ny = py[:, None] + offs[None, :, 0]  # (P, S²)
    nx = px[:, None] + offs[None, :, 1]
    inside = (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
    nyc = jnp.clip(ny, 0, H - 1)
    nxc = jnp.clip(nx, 0, W - 1)

    nbr_range = jnp.where(inside, proj_range[nyc, nxc], 0.0)  # unfold zero-pads
    # non-valid (<0) ranges → +inf so they never win the nn search (:89)
    nbr_range = jnp.where(nbr_range < 0, jnp.inf, nbr_range)
    center = (search * search - 1) // 2
    nbr_range = nbr_range.at[:, center].set(unproj_range)

    d = jnp.abs(nbr_range - unproj_range[:, None])
    d = d * jnp.asarray(inv_gaussian_window(search, sigma))[None, :]

    # K smallest weighted distances
    neg_top, idx = jax.lax.top_k(-d, knn)
    knn_d = -neg_top

    nbr_cls = jnp.where(inside, proj_argmax[nyc, nxc], 0).astype(jnp.int32)
    knn_cls = jnp.take_along_axis(nbr_cls, idx, axis=1)
    if cutoff > 0:
        knn_cls = jnp.where(knn_d > cutoff, nclasses, knn_cls)

    votes = jax.vmap(
        lambda c: jnp.zeros(nclasses + 1).at[c].add(1.0)
    )(knn_cls)
    # don't let it choose unlabeled (0) or the invalid cutoff bin (:136)
    return jnp.argmax(votes[:, 1:-1], axis=1).astype(jnp.int32) + 1
