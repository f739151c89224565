"""RangeNet semantic-segmentation trainer pieces.

Re-designs the loss/step core of ``tools/train/train_nusc_rangenet_sementic.py``
(551 LoC): weighted cross-entropy over range-image pixels with an ignore
label, plus mIoU evaluation.  The RangeNet backbone
(:mod:`..metrics.extractor.rangenet`) runs with frozen-BN statistics during
training here (BN-stat updates are a planned refinement); heads and convs are
fully trainable.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def weighted_pixel_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """(B, H, W, C) logits × (B, H, W) int labels → scalar loss."""
    C = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.clip(labels, 0, C - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = class_weights[safe]
    else:
        w = jnp.ones_like(nll)
    w = w * valid
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def mean_iou(
    logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int, ignore_index: int = -1
) -> jnp.ndarray:
    pred = jnp.argmax(logits, axis=-1)
    valid = labels != ignore_index
    ious = []
    for c in range(num_classes):
        p = (pred == c) & valid
        t = (labels == c) & valid
        inter = jnp.sum(p & t)
        union = jnp.sum(p | t)
        ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1), jnp.nan))
    ious = jnp.stack(ious)
    return jnp.nanmean(ious)


def make_segmentation_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    class_weights: jnp.ndarray | None = None,
    ignore_index: int = -1,
):
    """``step(params, opt_state, batch) -> (params, opt_state, loss)``;
    batch = {'image' (B,H,W,Cin), 'labels' (B,H,W)}."""

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(params):
            logits = apply_fn(params, batch["image"])
            return weighted_pixel_cross_entropy(
                logits, batch["labels"], class_weights, ignore_index
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
