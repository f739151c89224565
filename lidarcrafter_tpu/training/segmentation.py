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


def rangenet_class_weights(num_class: int = 17, epsilon_w: float = 0.001) -> jnp.ndarray:
    """Inverse-frequency weights with void class 0 zeroed; cf.
    ``train_nusc_rangenet_sementic.py:74-76`` (uniform content prior)."""
    content = jnp.full((num_class,), 1.0 / (num_class - 1))
    w = 1.0 / (content + epsilon_w)
    return w.at[0].set(0.0)


def warmup_exp_decay_schedule(
    lr: float, warmup_steps: int, decay: float
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """0 → lr linearly over ``warmup_steps``, then ``*= decay`` per step;
    cf. ``rangenet/common/warmupLR.py:6-36``."""
    warmup_steps = max(warmup_steps, 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        ramp = jnp.minimum(step / warmup_steps, 1.0)
        dec = decay ** jnp.maximum(step - warmup_steps, 0.0)
        return lr * ramp * dec

    return sched


def make_rangenet_optimizer(
    lr: float = 0.01,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    warmup_steps: int = 1000,
    decay: float = 0.9995,
) -> optax.GradientTransformation:
    """SGD + momentum + weight decay under the warmup/exp-decay schedule;
    cf. ``train_nusc_rangenet_sementic.py:106-121``."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(
            learning_rate=warmup_exp_decay_schedule(lr, warmup_steps, decay),
            momentum=momentum,
        ),
    )
