"""PointMLP foreground-object classifier trainer (aux model for CGF).

Re-designs ``tools/train/train_classification_pointmlp.py`` (251 LoC):
SGD momentum 0.9 + cosine-annealed LR, smoothed cross-entropy
(``metrics/utils/misc.py:218-233``), batch-stat handling through the flax
``batch_stats`` collection.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..metrics.extractor.pointmlp import PointMLP


def smoothed_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, eps: float = 0.2):
    """cf. ``cal_loss`` (``misc.py:218-233``): one-hot smoothed over the other
    classes by eps/(n-1)."""
    n_class = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, n_class)
    one_hot = one_hot * (1 - eps) + (1 - one_hot) * eps / (n_class - 1)
    log_prb = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(one_hot * log_prb, axis=-1))


def make_classifier_optimizer(
    lr: float = 0.1,
    min_lr: float = 0.005,
    epochs: int = 300,
    steps_per_epoch: int = 1,
    momentum: float = 0.9,
    weight_decay: float = 2e-4,
):
    """SGD + per-epoch CosineAnnealingLR; cf. ``train_classification_pointmlp.py:124-127``."""
    schedule = optax.cosine_decay_schedule(
        lr, decay_steps=epochs * steps_per_epoch, alpha=min_lr / lr
    )
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(schedule, momentum=momentum),
    )


def make_classifier_train_step(model: PointMLP, tx: optax.GradientTransformation):
    """Returns ``step(variables, opt_state, batch, rng) →
    (variables, opt_state, loss, acc)``; batch = {points (B,N,3), labels (B,)}."""

    @jax.jit
    def step(variables, opt_state, batch, rng):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["points"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = smoothed_cross_entropy(out, batch["labels"])
            return loss, (out, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, axis=-1) == batch["labels"])
        return {"params": params, "batch_stats": new_stats}, opt_state, loss, acc

    return step


@partial(jax.jit, static_argnames=("model",))
def classifier_eval_step(model: PointMLP, variables: Any, points: jnp.ndarray):
    return model.apply(variables, points)
