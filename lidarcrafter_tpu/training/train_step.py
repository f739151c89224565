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


def _amp_cast(tree, dtype):
    """Cast the floating leaves of a pytree (bf16 compute under AMP)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def _amp_wrap(fn):
    """bf16-AMP wrapper for an engine ``apply_fn``/``cond_apply_fn``: the
    model forward runs in bf16 (params + activations) while the caller keeps
    f32 master params, targets and loss math — the TPU-native analogue of the
    reference's fp16 Accelerate AMP (``option_unet_nusc.py:49``,
    ``train_lidm.py:54-62``).  Gradients flow through the cast back to the
    f32 leaves."""
    if fn is None:
        return None

    def wrapped(params, *args, **kwargs):
        out = fn(
            _amp_cast(params, jnp.bfloat16),
            *(_amp_cast(a, jnp.bfloat16) for a in args),
            **{k: _amp_cast(v, jnp.bfloat16) for k, v in kwargs.items()},
        )
        return _amp_cast(out, jnp.float32)

    return wrapped


def amp_engine(engine):
    """Return a copy of ``engine`` whose model/condition forwards run under
    bf16 AMP (see ``_amp_wrap``); schedules, q-sampling and loss reductions
    stay f32."""
    import dataclasses

    updates = {}
    for f in dataclasses.fields(engine):
        if f.name in ("apply_fn", "cond_apply_fn"):
            updates[f.name] = _amp_wrap(getattr(engine, f.name))
    return dataclasses.replace(engine, **updates)


def make_train_step(
    engine: ContinuousDiffusion,
    tx: optax.GradientTransformation,
    ema_beta: float = 0.995,
    ema_update_every: int = 10,
    ema_update_after_step: int = 100,
    donate: bool = True,
    loss_kwargs: dict | None = None,
    loss_has_aux: bool = False,
    amp: bool = False,
) -> Callable[[TrainState, jnp.ndarray, jax.Array], tuple[TrainState, jnp.ndarray]]:
    """Build ``train_step(state, x_0, rng) -> (state, loss)``.

    ``x_0``: (B, H, W, C) already normalized to [-1, 1]; rng is folded with the
    step counter so a single key drives the whole run.  ``loss_kwargs`` are
    forwarded to ``engine.loss`` (e.g. the layout engine's ``num_scenes``);
    ``loss_has_aux`` selects the scalar from a ``(loss, aux)`` return (the
    MeanFlow engine's ``(loss, mse)``).  ``amp=True`` runs the model forward
    (and backward) in bf16 with f32 master params/optimizer state
    (``TrainingConfig.mixed_precision == "bf16"``).
    """
    if amp:
        engine = amp_engine(engine)

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
