"""Train state pytree: step, params, EMA params, optimizer state."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

import optax


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: optax.OptState

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        import jax

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=tx.init(params),
        )
