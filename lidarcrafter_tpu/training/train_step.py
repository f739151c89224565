"""Jitted training step with data-parallel sharding.

Replaces the reference's Accelerate/DDP loop (``train_lidm.py:214-266``): the
gradient all-reduce is implicit in the jitted computation over the mesh; EMA
update and grad clipping fuse into the same XLA program (no separate host
steps).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..diffusion import ContinuousDiffusion
from .ema import ema_update
from .state import TrainState


def make_train_step(
    engine: ContinuousDiffusion,
    tx: optax.GradientTransformation,
    ema_beta: float = 0.995,
    ema_update_every: int = 10,
    ema_update_after_step: int = 100,
    donate: bool = True,
    loss_kwargs: dict | None = None,
    loss_has_aux: bool = False,
) -> Callable[[TrainState, jnp.ndarray, jax.Array], tuple[TrainState, jnp.ndarray]]:
    """Build ``train_step(state, x_0, rng) -> (state, loss)``.

    ``x_0``: (B, H, W, C) already normalized to [-1, 1]; rng is folded with the
    step counter so a single key drives the whole run.  ``loss_kwargs`` are
    forwarded to ``engine.loss`` (e.g. the layout engine's ``num_scenes``);
    ``loss_has_aux`` selects the scalar from a ``(loss, aux)`` return (the
    MeanFlow engine's ``(loss, mse)``).
    """

    def train_step(state: TrainState, x_0: jnp.ndarray, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = engine.loss(params, step_rng, x_0, **(loss_kwargs or {}))
            return out[0] if loss_has_aux else out

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(
            state.ema_params,
            params,
            state.step,
            beta=ema_beta,
            update_every=ema_update_every,
            update_after_step=ema_update_after_step,
        )
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
        )
        return new_state, loss

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
