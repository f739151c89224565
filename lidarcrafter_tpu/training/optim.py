"""Optimizer + LR schedule matching the reference trainer.

AdamW with grad-clip 1.0 (``train_lidm.py:109-115,223``) and the cosine-warmup
schedule of ``lidargen/utils/training.py:7-24``.
"""

from __future__ import annotations

import math

import optax


def cosine_warmup_schedule(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: float = 0.5,
) -> optax.Schedule:
    """lr(step): linear warmup then cosine decay; cf. ``utils/training.py:14-22``."""

    def schedule(count):
        import jax.numpy as jnp

        count = jnp.asarray(count, jnp.float32)
        warm = count / max(1, num_warmup_steps)
        progress = (count - num_warmup_steps) / max(
            1, num_training_steps - num_warmup_steps
        )
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        )
        return base_lr * jnp.where(count < num_warmup_steps, warm, cos)

    return schedule


def make_optimizer(
    lr: float = 1e-4,
    warmup_steps: int = 10_000,
    num_steps: int = 300_000,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    grad_clip: float = 1.0,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW + clip(+accumulation).

    With ``grad_accum_steps=k`` the optimizer matches the reference's
    ``accelerator.accumulate`` semantics (``train_lidm.py:219-226``): every
    call is a micro-step, gradients average over k micro-batches, parameters
    update on every k-th call, and the LR schedule advances per *micro*-step
    (the inner update count is scaled by k).
    """
    schedule = cosine_warmup_schedule(lr, warmup_steps, num_steps)
    if grad_accum_steps > 1:
        inner, k = schedule, grad_accum_steps
        schedule = lambda count: inner(count * k)  # noqa: E731
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay),
    )
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
