"""MeanFlow: one-/few-step flow matching with JVP targets.

TPU-native re-design of ``lidargen/models/flows/mean_flow.py:9-185``.  The
reference uses ``torch.autograd.functional.jvp``; in JAX the JVP is the native
``jax.jvp`` and the whole loss jits into a single XLA program.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


def adaptive_l2_loss(error: jnp.ndarray, gamma: float = 0.5, c: float = 1e-3):
    """cf. ``mean_flow.py:46-60``: sg(w)·||Δ||², w = (||Δ||²+c)^(γ−1)."""
    axes = tuple(range(1, error.ndim))
    delta_sq = jnp.mean(error**2, axis=axes)
    p = 1.0 - gamma
    w = 1.0 / (delta_sq + c) ** p
    return jnp.mean(jax.lax.stop_gradient(w) * delta_sq)


@dataclasses.dataclass(frozen=True)
class MeanFlow:
    """``apply_fn(params, z, t, r) -> u`` (two-time velocity model)."""

    apply_fn: Callable[..., jnp.ndarray]
    sampling_shape: tuple[int, ...]
    flow_ratio: float = 0.50
    time_mu: float = -0.4
    time_sigma: float = 1.0
    time_dist: str = "lognorm"

    def sample_t_r(self, rng: jax.Array, batch_size: int):
        """cf. ``mean_flow.py:107-126``: lognorm (t, r), t=max, r=min; a
        ``flow_ratio`` fraction of samples gets r = t."""
        rng_s, rng_sel = jax.random.split(rng)
        if self.time_dist == "uniform":
            samples = jax.random.uniform(rng_s, (batch_size, 2))
        elif self.time_dist == "lognorm":
            normal = jax.random.normal(rng_s, (batch_size, 2)) * self.time_sigma + self.time_mu
            samples = jax.nn.sigmoid(normal)
        else:
            raise ValueError(self.time_dist)
        t = jnp.maximum(samples[:, 0], samples[:, 1])
        r = jnp.minimum(samples[:, 0], samples[:, 1])
        num_selected = int(self.flow_ratio * batch_size)
        idx = jax.random.permutation(rng_sel, batch_size)[:num_selected]
        r = r.at[idx].set(t[idx])
        return t, r

    def loss(self, params: Any, rng: jax.Array, x: jnp.ndarray):
        """cf. ``mean_flow.py:128-160``: u_tgt = v − (t−r)·du/dt via JVP."""
        rng_tr, rng_e = jax.random.split(rng)
        B = x.shape[0]
        t, r = self.sample_t_r(rng_tr, B)
        t_ = t.reshape(B, *([1] * (x.ndim - 1)))
        r_ = r.reshape(B, *([1] * (x.ndim - 1)))
        e = jax.random.normal(rng_e, x.shape, x.dtype)
        z = (1 - t_) * x + t_ * e
        v = e - x

        def f(z, t, r):
            return self.apply_fn(params, z, t, r)

        u, dudt = jax.jvp(f, (z, t, r), (v, jnp.ones_like(t), jnp.zeros_like(r)))
        u_tgt = v - (t_ - r_) * dudt
        error = u - jax.lax.stop_gradient(u_tgt)
        loss = adaptive_l2_loss(error)
        mse_val = jnp.mean(jax.lax.stop_gradient(error) ** 2)
        return loss, mse_val

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def sample(self, params: Any, rng: jax.Array, batch_size: int = 1):
        """One-step sampling; cf. ``mean_flow.py:172-185``: z − u(z, 1, 0)."""
        z = jax.random.normal(rng, (batch_size, *self.sampling_shape), jnp.float32)
        t = jnp.ones((batch_size,))
        r = jnp.zeros((batch_size,))
        return z - self.apply_fn(params, z, t, r)
