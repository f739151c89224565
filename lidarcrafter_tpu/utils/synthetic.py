"""Synthetic structured range-image distribution for certs and smoke tests.

One implementation shared by ``bench.py::bench_solver_cert`` (the on-chip
production-stack solver certification trains on it) and
``tests/test_solver_quality_e2e.py`` (the train→sample→metric smoke) so the
two stay certified against the SAME distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def banded_range_image_batch(
    key: jax.Array, batch: int, H: int, W: int, freq_levels: int = 4
) -> jnp.ndarray:
    """(B, H, W, 2) banded sinusoidal depth + correlated reflectance.

    Learnable but non-trivial: per-sample random phase and integer frequency
    (1..freq_levels) over the azimuth axis, depth attenuated toward the lower
    rows, reflectance = 0.5·depth + noise, both in [-1, 1].
    """
    k1, k2, k3 = jax.random.split(key, 3)
    phase = jax.random.uniform(k1, (batch, 1, 1)) * 2 * jnp.pi
    freq = 1.0 + jax.random.randint(k2, (batch, 1, 1), 0, freq_levels).astype(
        jnp.float32
    )
    cols = jnp.arange(W)[None, None, :] / W
    rows = jnp.arange(H)[None, :, None] / H
    depth = 0.6 * jnp.sin(2 * jnp.pi * freq * cols + phase) * (1 - 0.5 * rows)
    refl = jnp.clip(
        0.5 * depth + 0.1 * jax.random.normal(k3, (batch, H, W)), -1, 1
    )
    return jnp.stack([depth, refl], axis=-1)
