"""Exponential moving average of parameters, matching ``ema_pytorch.EMA`` semantics
as used by the reference trainer (``tools/train/train_lidm.py:95-103,231``):

- ``update()`` is called once per optimizer step; the EMA only moves every
  ``update_every`` calls;
- before ``update_after_step`` the EMA is a copy of the online weights;
- afterwards the decay ramps as ``1 - (1 + epoch/inv_gamma)^(-power)`` clamped
  to ``[0, beta]`` (ema_pytorch's default inv_gamma=1, power=2/3).

Implemented as a pure function over pytrees, branchless (``jnp.where``) so it
jits into the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay_schedule(
    step: jnp.ndarray,
    beta: float = 0.995,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
) -> jnp.ndarray:
    """Current decay given the number of ``update()`` calls so far."""
    epoch = jnp.clip(step - update_after_step - 1, min=0).astype(jnp.float32)
    value = 1.0 - (1.0 + epoch / inv_gamma) ** (-power)
    return jnp.where(epoch <= 0, 0.0, jnp.clip(value, 0.0, beta))


def ema_update(
    ema_params,
    online_params,
    step: jnp.ndarray,
    beta: float = 0.995,
    update_every: int = 10,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
):
    """One (conditional) EMA step; ``step`` counts optimizer steps from 0."""
    decay = ema_decay_schedule(step, beta, update_after_step, inv_gamma, power)
    do_update = (step % update_every) == 0
    eff = jnp.where(do_update, decay, 1.0)  # decay==0 → copy online weights

    def _lerp(e, o):
        return e * eff + o.astype(e.dtype) * (1.0 - eff)

    return jax.tree_util.tree_map(_lerp, ema_params, online_params)
