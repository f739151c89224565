"""GLENet: CVAE box-uncertainty model (RGF backbone), flax.

Re-designs ``lidargen/metrics/models/glenet/model.py`` (442 LoC) +
``point_net.py``: prior encoder p(z|x), posterior encoder q(z|x,y), and a
SimPointNet box decoder; training loss = smooth-L1 on sin-difference-encoded
boxes + direction-bin CE + KL(q‖p) + L2 regularization; inference draws
``z ~ p(z|x)`` per MC pass (RGF runs 30 passes × 10 folds,
``fg_object.py:456-500``) and decodes the heading from the direction bins.

Point features concatenate a 512-d CLIP text feature (``point_net.py:28-37``).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class GLEPointNetFeat(nn.Module):
    """cf. ``glenet/point_net.py:11-37``; x (B, N, C) + text (B, 512) → (B, 512·s)."""

    width: float = 1.0
    sim: bool = False  # SimPointNetfeat variant (:40-66)

    @nn.compact
    def __call__(self, x, text_feat, train: bool = False):
        if self.sim:
            chans = [int(16 * self.width)] * 3
            out_ch = int(16 * self.width)
            seq = (256, out_ch)
        else:
            chans = [int(64 * self.width), int(128 * self.width), int(512 * self.width)]
            out_ch = int(512 * self.width)
            seq = (768, 512)
        h = x
        for i, c in enumerate(chans):
            h = nn.Dense(c, name=f"conv{i + 1}")(h)
            h = nn.BatchNorm(use_running_average=not train, axis=-1, name=f"bn{i + 1}")(h)
            if i < 2:
                h = nn.relu(h)
        h = jnp.max(h, axis=1)  # (B, out_ch)
        h = jnp.concatenate([h, text_feat], axis=1)
        h = nn.Dense(seq[0], name="seq0")(h)
        h = nn.relu(h)
        h = nn.Dense(seq[1], name="seq1")(h)
        return h


class LatentEncoder(nn.Module):
    """Encoder_x / Encoder_xy; cf. ``model.py:33-79``.  scale = exp(logvar)."""

    latent_size: int = 3
    conditional: bool = False

    @nn.compact
    def __call__(self, x, text_feat, y=None, train: bool = False):
        h = GLEPointNetFeat(name="fe")(x, text_feat, train)
        if self.conditional:
            h = jnp.concatenate([h, y], axis=1)
        mu = nn.Dense(self.latent_size, name="fc1")(h)
        logvar = nn.Dense(self.latent_size, name="fc2")(h)
        # numerical guard only: σ = exp(logvar), so |logvar| > 8 overflows the
        # KL term (exp(±16) in var space) long before any trained net reaches
        # it; the clamp is inert at converged weights.
        return mu, jnp.clip(logvar, -8.0, 8.0)


class ObjectFeatEncoder(nn.Module):
    """Box decoder; cf. ``model.py:81-149``: centers(3)+sizes(3)+heading(1)+dir(2)."""

    latent_dim: int = 3
    num_bins: int = 2

    @nn.compact
    def __call__(self, x, text_feat, z, train: bool = False):
        h = GLEPointNetFeat(width=0.5, sim=True, name="fe")(x, text_feat, train)
        h = jnp.concatenate([h, z], axis=1)
        w = 64  # 256 * fc_scale(0.25)
        h = nn.Dense(w, name="fc1")(h)
        h = nn.BatchNorm(use_running_average=not train, axis=-1, name="bn1")(h)
        h = nn.relu(h)
        feat = nn.relu(
            nn.BatchNorm(use_running_average=not train, axis=-1, name="bn2")(
                nn.Dense(w, name="fc2")(feat_in := h)
            )
        )

        def head(name, out, bias=False):
            hh = nn.relu(nn.Dense(w, name=f"{name}1")(feat))
            return nn.Dense(out, use_bias=bias, name=f"{name}2")(hh)

        centers = head("fc_ce", 3)
        sizes = head("fc_s", 3)
        headings = head("fc_hr", 1)
        dirs = head("fc_dir", self.num_bins)
        return jnp.concatenate([centers, sizes, headings, dirs], axis=1)


def kl_diag_gaussians(mu_q, logvar_q, mu_p, logvar_p):
    """KL(q‖p) for diagonal Gaussians with scale = exp(logvar) (reference
    convention, ``model.py:49``): σ = exp(logvar) + 3e-22."""
    log_sq = logvar_q
    log_sp = logvar_p
    var_q = jnp.exp(2 * log_sq)
    var_p = jnp.exp(2 * log_sp)
    kl = log_sp - log_sq + (var_q + (mu_q - mu_p) ** 2) / (2 * var_p) - 0.5
    return jnp.sum(kl, axis=-1)


def add_sin_difference(boxes1, boxes2, dim: int = 6):
    """cf. ``model.py:278-285``: encode heading as sin(a−b) split."""
    rad_pred = jnp.sin(boxes1[..., dim : dim + 1]) * jnp.cos(boxes2[..., dim : dim + 1])
    rad_tg = jnp.cos(boxes1[..., dim : dim + 1]) * jnp.sin(boxes2[..., dim : dim + 1])
    b1 = jnp.concatenate([boxes1[..., :dim], rad_pred, boxes1[..., dim + 1 :]], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :dim], rad_tg, boxes2[..., dim + 1 :]], axis=-1)
    return b1, b2


def get_direction_target(reg_targets, dir_offset: float = 0.0, num_bins: int = 2):
    """cf. ``model.py:287-301``: heading → direction bin one-hot."""
    rot = reg_targets[..., 6] - dir_offset
    offset_rot = rot - jnp.floor(rot / (2 * jnp.pi)) * (2 * jnp.pi)
    dir_cls = jnp.clip(
        jnp.floor(offset_rot / (2 * jnp.pi / num_bins)).astype(jnp.int32),
        0, num_bins - 1,
    )
    return jax.nn.one_hot(dir_cls, num_bins)


def smooth_l1(diff, beta: float = 1.0 / 9.0):
    """pcdet WeightedSmoothL1Loss default beta."""
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad**2 / beta, ad - 0.5 * beta)


class GLENet(nn.Module):
    """cf. ``Generator`` (``model.py:151-276``)."""

    latent_size: int = 3
    num_bins: int = 2
    dir_offset: float = 0.0
    loc_weight: float = 1.0
    dir_weight: float = 0.2
    latent_weight: float = 1.0

    def setup(self):
        self.x_encoder = LatentEncoder(self.latent_size, name="x_encoder")
        self.xy_encoder = LatentEncoder(
            self.latent_size, conditional=True, name="xy_encoder"
        )
        self.obj_encoder = ObjectFeatEncoder(self.latent_size, self.num_bins, name="obj_encoder")

    def __call__(self, batch_dict, rng=None, train: bool = False):
        """Train: returns (reg_loss, latent_loss, box_pred_post).
        Eval: returns decoded box predictions (B, 9) with heading corrected
        by the argmax direction bin (``model.py:250-276``)."""
        x = batch_dict["points"]  # (B, N, C)
        text_feat = batch_dict["text_feat"]
        if train:
            y = batch_dict["gt_boxes_input"]  # (B, 8)
            labels = batch_dict["gt_boxes"]  # (B, 7)
            mu_q, logvar_q = self.xy_encoder(x, text_feat, y, train)
            mu_p, logvar_p = self.x_encoder(x, text_feat, train=train)
            latent_loss = jnp.mean(
                kl_diag_gaussians(mu_q, logvar_q, mu_p, logvar_p)
            ) * self.latent_weight
            std = jnp.exp(0.5 * logvar_q)
            eps = jax.random.normal(rng, std.shape)
            z = mu_q + eps * std
            box_pred = self.obj_encoder(x, text_feat, z, train)

            # reg loss (cf. :303-357)
            B = box_pred.shape[0]
            pred_sin, tg_sin = add_sin_difference(box_pred[:, :7], labels)
            loc_loss = jnp.sum(smooth_l1(pred_sin - tg_sin)) / B * self.loc_weight
            dir_tg = get_direction_target(labels, self.dir_offset, self.num_bins)
            dir_logits = box_pred[:, -self.num_bins :]
            dir_loss = (
                jnp.sum(
                    -dir_tg * jax.nn.log_softmax(dir_logits, axis=-1)
                )
                / B
                * self.dir_weight
            )
            return loc_loss + dir_loss, latent_loss, box_pred
        else:
            mu_p, logvar_p = self.x_encoder(x, text_feat)
            std = jnp.exp(0.5 * logvar_p)
            eps = jax.random.normal(rng, std.shape) if rng is not None else 0.0
            z = mu_p + eps * std
            box_pred = self.obj_encoder(x, text_feat, z)
            dir_labels = jnp.argmax(box_pred[:, -self.num_bins :], axis=-1)
            period = 2 * jnp.pi / self.num_bins
            rot = box_pred[..., 6] - self.dir_offset
            dir_rot = rot - jnp.floor(rot / period) * period
            heading = dir_rot + self.dir_offset + period * dir_labels
            return box_pred.at[..., 6].set(heading)


def mc_uncertainty(apply_fn, batch_dict, rng, num_passes: int = 30):
    """RGF inner loop: variance of box predictions over MC prior samples;
    cf. ``compute_rgf`` (``fg_object.py:456-500``, 30 passes)."""
    preds = []
    for i in range(num_passes):
        preds.append(apply_fn(batch_dict, jax.random.fold_in(rng, i)))
    preds = jnp.stack(preds)  # (P, B, 9)
    return jnp.var(preds[..., :7], axis=0), jnp.mean(preds, axis=0)


# exp20.yaml — the fold-training recipe RGF uses (MODEL + LOSS_WEIGHTS).
EXP20_KWARGS = dict(
    latent_size=8,
    dir_offset=0.78539,
    loc_weight=10.0,
    dir_weight=0.002,
    latent_weight=10.0,
)


def l2_param_norm(params):
    """Sum of L2 norms of every parameter leaf; cf. ``l2_regularisation``
    (``glenet/model.py:21-29`` — note: norms, not squared norms).  The norm
    is epsilon-smoothed: d‖p‖/dp at p=0 is 0/0 (zero-init biases would NaN
    the whole gradient on step one)."""
    return sum(
        jnp.sqrt(jnp.sum(jnp.square(p)) + 1e-12)
        for p in jax.tree_util.tree_leaves(params)
    )


def make_glenet_optimizer(lr: float = 0.003, total_steps: int = 1000,
                          weight_decay: float = 0.01,
                          grad_clip: float = 10.0,
                          pct_start: float = 0.4, div_factor: float = 10.0):
    """adam_onecycle analogue (exp20.yaml OPTIMIZATION): cosine one-cycle LR
    with warmup from lr/div_factor, AdamW decoupled weight decay, global-norm
    clip 10."""
    import optax

    sched = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 1), peak_value=lr,
        pct_start=pct_start, div_factor=div_factor,
    )
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def make_glenet_train_step(model, tx):
    """Jitted CVAE train step: loss = reg + anneal·latent + 1e-4·Σ‖W‖₂
    (cf. ``train_utils.py:53-70``: the KL term is linearly annealed 0→1 over
    training; the L2 term is ``get_training_loss``'s ``regular_loss``,
    ``model.py:359-362``)."""
    import optax

    @jax.jit
    def step(variables, opt_state, batch, rng, anneal):
        def loss_fn(params):
            (reg, latent, _), mutated = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, rng=rng, train=True, mutable=["batch_stats"],
            )
            loss = reg + anneal * latent + 1e-4 * l2_param_norm(params)
            return loss, (mutated["batch_stats"], reg, latent)

        (loss, (bs, reg, latent)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return (
            {"params": params, "batch_stats": bs},
            opt_state,
            {"loss": loss, "reg": reg, "latent": latent},
        )

    return step


def load_glenet_fold(path):
    """(model, variables) from a ``tools/train_glenet.py`` fold checkpoint
    pickle {"variables", "model_kwargs"}."""
    import pickle

    with open(path, "rb") as f:
        ckpt = pickle.load(f)
    return GLENet(**ckpt.get("model_kwargs", {})), ckpt["variables"]


def load_glenet_from_torch(ckpt_path, **model_kwargs):
    """Build (model, variables) from a reference GLENet torch checkpoint
    (``../pretrained_models/evaluation/nuscenes/glenet/*.pth``,
    ``fg_object.py:54``) so RGF runs the released uncertainty weights.
    Accepts plain state_dicts and pcdet-style {'model_state': ...} /
    {'net': ...} wrappers."""
    import torch

    from ...utils.torch_ckpt import convert_glenet

    obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    for key in ("model_state", "net", "state_dict"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    sd = {k: v.numpy() for k, v in obj.items() if "num_batches_tracked" not in k}
    model = GLENet(**model_kwargs)
    return model, convert_glenet(sd)
