"""BEV xy-histograms (on-device scatter-add); cf. ``lidargen/metrics/bev.py:5-22``.

torch.histogramdd semantics: ``bins`` equal-width bins over [-bound, bound] per
axis, right-inclusive last edge.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("field_size", "bins", "min_depth", "max_depth"))
def point_cloud_to_histogram(
    point_cloud: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    field_size: float = 160.0,
    bins: int = 100,
    min_depth: float = 3.0,
    max_depth: float = 70.0,
) -> jnp.ndarray:
    """(N, 3) [+ optional validity mask] → (bins, bins) float histogram."""
    assert bins % 2 == 0
    depth = jnp.linalg.norm(point_cloud, axis=1)
    valid = (depth > min_depth) & (depth < max_depth)
    if mask is not None:
        valid &= mask
    bound = field_size / 2
    width = field_size / bins
    xy = point_cloud[:, 0:2]
    ij = jnp.floor((xy + bound) / width).astype(jnp.int32)
    # histogramdd: right edge of last bin is inclusive
    ij = jnp.where((xy == bound) & (ij == bins), bins - 1, ij)
    in_range = jnp.all((xy >= -bound) & (xy <= bound), axis=1) & valid
    flat = jnp.where(in_range, ij[:, 0] * bins + ij[:, 1], bins * bins)
    hist = jax.ops.segment_sum(
        in_range.astype(jnp.float32), flat, num_segments=bins * bins + 1
    )[: bins * bins]
    return hist.reshape(bins, bins)
