"""Noise schedules for continuous- and discrete-time Gaussian diffusion.

Closed-form re-implementations of the reference's schedules
(``lidargen/models/diffusion/continuous_time.py:14-63`` and
``discrete_time.py:12-48``) as pure jnp functions of the timestep array.
No broadcasting dims are baked in (the torch versions append
``[:, None, None, None]``); callers broadcast as needed, which keeps the same
functions usable for 4D images, 3D layout tensors, and point clouds.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax.numpy as jnp
import numpy as np


def _log(t: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return jnp.log(jnp.clip(t, min=eps))


def log_snr_schedule_linear(t: jnp.ndarray) -> jnp.ndarray:
    """cf. ``continuous_time.py:18-19``."""
    return -_log(jnp.expm1(1e-4 + 10 * (t**2)))


def log_snr_schedule_cosine(
    t: jnp.ndarray, logsnr_min: float = -15.0, logsnr_max: float = 15.0
) -> jnp.ndarray:
    """cf. ``continuous_time.py:22-29``."""
    t_min = math.atan(math.exp(-0.5 * logsnr_max))
    t_max = math.atan(math.exp(-0.5 * logsnr_min))
    return -2.0 * _log(jnp.tan(t_min + t * (t_max - t_min)))


def log_snr_schedule_cosine_shifted(
    t: jnp.ndarray,
    image_d: float,
    noise_d: float,
    logsnr_min: float = -15.0,
    logsnr_max: float = 15.0,
) -> jnp.ndarray:
    """cf. ``continuous_time.py:32-41``."""
    log_snr = log_snr_schedule_cosine(t, logsnr_min, logsnr_max)
    return log_snr + 2.0 * math.log(noise_d / image_d)


def log_snr_schedule_cosine_interpolated(
    t: jnp.ndarray,
    image_d: float,
    noise_d_low: float,
    noise_d_high: float,
    logsnr_min: float = -15.0,
    logsnr_max: float = 15.0,
) -> jnp.ndarray:
    """cf. ``continuous_time.py:44-58``."""
    lo = log_snr_schedule_cosine_shifted(t, image_d, noise_d_low, logsnr_min, logsnr_max)
    hi = log_snr_schedule_cosine_shifted(t, image_d, noise_d_high, logsnr_min, logsnr_max)
    return t * lo + (1 - t) * hi


def log_snr_to_alpha_sigma(log_snr: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cf. ``continuous_time.py:61-63``."""
    alpha = jnp.sqrt(jax_sigmoid(log_snr))
    sigma = jnp.sqrt(jax_sigmoid(-log_snr))
    return alpha, sigma


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / (1.0 + jnp.exp(-x))


def get_log_snr_fn(
    noise_schedule: str,
    image_d: float | None = None,
    noise_d_low: float | None = None,
    noise_d_high: float | None = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Schedule factory; cf. ``continuous_time.py:108-133``."""
    if noise_schedule == "linear":
        return log_snr_schedule_linear
    if noise_schedule == "cosine":
        return log_snr_schedule_cosine
    if noise_schedule == "cosine_shifted":
        assert image_d is not None and noise_d_low is not None
        return partial(
            log_snr_schedule_cosine_shifted, image_d=image_d, noise_d=noise_d_low
        )
    if noise_schedule == "cosine_interpolated":
        assert None not in (image_d, noise_d_low, noise_d_high)
        return partial(
            log_snr_schedule_cosine_interpolated,
            image_d=image_d,
            noise_d_low=noise_d_low,
            noise_d_high=noise_d_high,
        )
    raise ValueError(f"invalid noise schedule: {noise_schedule}")


# --------------------------------------------------------------------- discrete
# Beta tables depend only on the static step count, so they are computed
# host-side in numpy float64 (matching the reference's torch.float64 tables,
# ``discrete_time.py:57-78``) and embedded as constants.


def beta_schedule_linear(T: int) -> np.ndarray:
    """cf. ``discrete_time.py:12-19`` (DDPM linear betas scaled by 1000/T)."""
    scale = 1000.0 / T
    return np.linspace(scale * 0.0001, scale * 0.02, T, dtype=np.float64)


def beta_schedule_cosine(T: int, s: float = 0.008) -> np.ndarray:
    """cf. ``discrete_time.py:22-31`` (improved-DDPM cosine alphabar)."""
    t = np.linspace(0, T, T + 1, dtype=np.float64) / T
    alphas_cumprod = np.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def beta_schedule_sigmoid(
    T: int, start: float = -3, end: float = 3, tau: float = 1.0
) -> np.ndarray:
    """cf. ``discrete_time.py:34-48``."""
    t = np.linspace(0, T, T + 1, dtype=np.float64) / T
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    v_start = sig(start / tau)
    v_end = sig(end / tau)
    alphas_cumprod = (-sig((t * (end - start) + start) / tau) + v_end) / (
        v_end - v_start
    )
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)
