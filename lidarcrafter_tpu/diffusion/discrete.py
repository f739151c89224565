"""Discrete-time DDPM engine.

TPU-native re-design of ``lidargen/models/diffusion/discrete_time.py:51-201``
(``DiscreteTimeGaussianDiffusion``): buffered beta/alpha-bar tables computed in
float64 host-side, pure-function loss/steps, sampler as one ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Literal

import numpy as np

import jax
import jax.numpy as jnp

from . import schedules
from .continuous import _bcast


def _tables(noise_schedule: str, T: int):
    if noise_schedule == "linear":
        beta = schedules.beta_schedule_linear(T)
    elif noise_schedule == "cosine":
        beta = schedules.beta_schedule_cosine(T)
    elif noise_schedule == "sigmoid":
        beta = schedules.beta_schedule_sigmoid(T)
    else:
        raise ValueError(noise_schedule)
    beta = np.asarray(beta, np.float64)
    alpha_bar = np.cumprod(1 - beta)
    alpha_bar_prev = np.concatenate([[1.0], alpha_bar[:-1]])
    snr = alpha_bar / (1 - alpha_bar)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return f32(beta), f32(alpha_bar), f32(alpha_bar_prev), f32(snr)


@dataclasses.dataclass(frozen=True)
class DiscreteDiffusion:
    """``apply_fn(params, x_t, steps) -> prediction`` (steps are int indices)."""

    apply_fn: Any
    sampling_shape: tuple[int, ...]
    num_training_steps: int = 1000
    prediction_type: Literal["eps", "v", "x_0"] = "eps"
    loss_type: Literal["l2", "l1", "huber"] = "l2"
    noise_schedule: str = "linear"
    min_snr_loss_weight: bool = True
    min_snr_gamma: float = 5.0
    clip_sample: bool = True
    clip_sample_range: float = 1.0

    def tables(self):
        return _tables(self.noise_schedule, self.num_training_steps)

    def criterion(self, pred, target):
        if self.loss_type == "l2":
            return (pred - target) ** 2
        if self.loss_type == "l1":
            return jnp.abs(pred - target)
        if self.loss_type == "huber":
            diff = jnp.abs(pred - target)
            return jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)
        raise ValueError(self.loss_type)

    def get_target(self, x_0, steps, noise):
        if self.prediction_type == "eps":
            return noise
        if self.prediction_type == "x_0":
            return x_0
        if self.prediction_type == "v":
            _, alpha_bar, _, _ = self.tables()
            ab = _bcast(alpha_bar[steps], x_0.ndim)
            return jnp.sqrt(ab) * noise - jnp.sqrt(1 - ab) * x_0
        raise ValueError(self.prediction_type)

    def get_loss_weight(self, steps):
        _, _, _, snr = self.tables()
        snr = snr[steps]
        clipped = jnp.minimum(snr, self.min_snr_gamma) if self.min_snr_loss_weight else snr
        if self.prediction_type == "eps":
            return clipped / snr
        if self.prediction_type == "x_0":
            return clipped
        if self.prediction_type == "v":
            return clipped / (snr + 1)
        raise ValueError(self.prediction_type)

    def q_step_from_x_0(self, x_0, steps, rng):
        _, alpha_bar, _, _ = self.tables()
        ab = _bcast(alpha_bar[steps], x_0.ndim)
        noise = jax.random.normal(rng, x_0.shape, x_0.dtype)
        return jnp.sqrt(ab) * x_0 + jnp.sqrt(1 - ab) * noise, noise

    def p_loss(self, params, rng, x_0, steps, loss_mask=None, model_kwargs=None):
        loss_mask = jnp.ones_like(x_0) if loss_mask is None else loss_mask
        x_t, noise = self.q_step_from_x_0(x_0, steps, rng)
        prediction = self.apply_fn(params, x_t, steps, **(model_kwargs or {}))
        target = self.get_target(x_0, steps, noise)
        loss = self.criterion(prediction, target)
        axes = tuple(range(1, x_0.ndim))
        loss = jnp.sum(loss * loss_mask, axis=axes) / (
            jnp.sum(loss_mask, axis=axes) + 1e-8
        )
        return jnp.mean(loss * self.get_loss_weight(steps))

    def loss(self, params, rng, x_0, loss_mask=None, model_kwargs=None):
        rng_t, rng_q = jax.random.split(rng)
        steps = jax.random.randint(
            rng_t, (x_0.shape[0],), 0, self.num_training_steps
        )
        return self.p_loss(params, rng_q, x_0, steps, loss_mask, model_kwargs)

    def p_step(self, params, rng, x_t, steps, mode="ddim", eta=0.0, model_kwargs=None):
        """cf. ``discrete_time.py:126-181``."""
        beta_t, alpha_bar_t, alpha_bar_prev_t, _ = self.tables()
        beta = _bcast(beta_t[steps], x_t.ndim)
        alpha = 1 - beta
        ab = _bcast(alpha_bar_t[steps], x_t.ndim)
        abp = _bcast(alpha_bar_prev_t[steps], x_t.ndim)
        prediction = self.apply_fn(params, x_t, steps, **(model_kwargs or {}))
        if self.prediction_type == "eps":
            x_0 = jax.lax.rsqrt(ab) * x_t - jnp.sqrt(1.0 / ab - 1) * prediction
        elif self.prediction_type == "x_0":
            x_0 = prediction
        elif self.prediction_type == "v":
            x_0 = jnp.sqrt(ab) * x_t - jnp.sqrt(1 - ab) * prediction
        else:
            raise ValueError(self.prediction_type)
        if self.clip_sample:
            x_0 = jnp.clip(x_0, -self.clip_sample_range, self.clip_sample_range)
        is_zero = _bcast((steps == 0).astype(x_t.dtype), x_t.ndim)
        noise = jax.random.normal(rng, x_t.shape, x_t.dtype) * (1 - is_zero)
        if mode == "ddpm":
            x0c = jnp.sqrt(abp) * beta / (1 - ab)
            xtc = (1 - abp) * jnp.sqrt(alpha) / (1 - ab)
            mean = x0c * x_0 + xtc * x_t
            var = jnp.clip(beta * (1 - abp) / (1 - ab), min=1e-20)
            return mean + jnp.exp(0.5 * jnp.log(var)) * noise
        if mode == "ddim":
            var = (1 - abp) / (1 - ab) * (1 - ab / abp)
            std = eta * jnp.sqrt(var)
            eps = (x_t - jnp.sqrt(ab) * x_0) / jnp.sqrt(1 - ab)
            x_s = jnp.sqrt(abp) * x_0 + jnp.sqrt(1 - abp - std**2) * eps
            if eta > 0:
                x_s = x_s + std * noise
            return x_s
        raise ValueError(mode)

    @partial(jax.jit, static_argnames=("self", "batch_size", "num_steps", "mode"))
    def sample(self, params, rng, batch_size, num_steps, mode="ddpm", model_kwargs=None):
        """cf. ``discrete_time.py:184-201`` — reversed timestep scan."""
        rng_init, rng_scan = jax.random.split(rng)
        x = jax.random.normal(rng_init, (batch_size, *self.sampling_shape), jnp.float32)

        def body(x, i):
            timestep = num_steps - 1 - i
            steps = jnp.full((batch_size,), timestep, jnp.int32)
            return (
                self.p_step(
                    params, jax.random.fold_in(rng_scan, i), x, steps,
                    mode=mode, model_kwargs=model_kwargs,
                ),
                None,
            )

        x, _ = jax.lax.scan(body, x, jnp.arange(num_steps))
        return x
