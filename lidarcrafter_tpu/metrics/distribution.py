"""Fréchet distance and squared MMD on feature sets.

Re-designs ``lidargen/metrics/distribution.py:5-27`` and the stable numerics of
``fid_score.py:116-168``: tr·sqrtm(Σ₁Σ₂) is computed on-device via symmetric
eigendecompositions (Σ₁Σ₂ is similar to Σ₁^{1/2}Σ₂Σ₁^{1/2}, which is
symmetric PSD, so trace of its sqrt is Σᵢ√λᵢ) instead of scipy's general
Schur-based ``sqrtm``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _sym_sqrtm(mat: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    vals, vecs = jnp.linalg.eigh(mat)
    vals = jnp.sqrt(jnp.clip(vals, min=0.0))
    return (vecs * vals[None, :]) @ vecs.T


def trace_sqrt_product(sigma1: jnp.ndarray, sigma2: jnp.ndarray) -> jnp.ndarray:
    """tr sqrtm(Σ₁·Σ₂) for symmetric PSD Σ."""
    s1h = _sym_sqrtm(sigma1)
    m = s1h @ sigma2 @ s1h
    vals = jnp.linalg.eigvalsh(m)
    return jnp.sum(jnp.sqrt(jnp.clip(vals, min=0.0)))


def compute_frechet_distance(feats1, feats2) -> float:
    """cf. ``distribution.py:5-13`` / ``fid_score.py:116-168``."""
    feats1 = jnp.asarray(feats1, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    feats2 = jnp.asarray(feats2, feats1.dtype)
    mu1 = jnp.mean(feats1, axis=0)
    mu2 = jnp.mean(feats2, axis=0)
    sigma1 = jnp.cov(feats1, rowvar=False)
    sigma2 = jnp.cov(feats2, rowvar=False)
    m = jnp.sum((mu1 - mu2) ** 2)
    tr = trace_sqrt_product(sigma1, sigma2)
    return float(m + jnp.trace(sigma1) + jnp.trace(sigma2) - 2 * tr)


def compute_squared_mmd(
    feats1,
    feats2,
    num_subsets: int = 100,
    max_subset_size: int = 1000,
    seed: int = 0,
) -> float:
    """Polynomial-kernel subset MMD²; cf. ``distribution.py:16-27``."""
    feats1 = np.asarray(feats1)
    feats2 = np.asarray(feats2)
    n = feats1.shape[1]
    m = min(min(feats1.shape[0], feats2.shape[0]), max_subset_size)
    rng = np.random.RandomState(seed)
    t = 0.0
    x_all = jnp.asarray(feats2)
    y_all = jnp.asarray(feats1)

    @jax.jit
    def subset_term(x, y):
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        return (jnp.sum(a) - jnp.trace(a)) / (m - 1) - jnp.sum(b) * 2 / m

    for _ in range(num_subsets):
        x = x_all[rng.choice(feats2.shape[0], m, replace=False)]
        y = y_all[rng.choice(feats1.shape[0], m, replace=False)]
        t += float(subset_term(x, y))
    return t / num_subsets / m
