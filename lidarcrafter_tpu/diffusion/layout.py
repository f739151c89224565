"""Layout (1D) diffusion engine: per-object box+trajectory vectors.

Re-designs ``lidargen/models/diffusion/continuous_layout_cond.py:9-191``
(``CondContinuousLayoutGaussianDiffusion``) and the 1D object variant
``continuous_time_1d_cond.py:9``:

- x is the flat node batch (N, 20) = 8 box dims + 12 trajectory dims
  (``continuous_layout_cond.py:152-153``); the loss mask is the validity
  channel block boxes[:, 20:];
- all nodes of a scene share one timestep: the reference derives this with
  ``torch.unique(sample_ids)`` (:54-59) — a trap under jit; here scene ids are
  precomputed dense indices and t is sampled per scene then gathered;
- the condition model is the SceneGraph GCN; the denoiser receives
  {'preds', 'uc_b', 'c_b', 'edge_mask'} (cf. ``prepare_df_input`` :66-69).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Literal

import jax
import jax.numpy as jnp

from .continuous import ContinuousDiffusion, _bcast


@dataclasses.dataclass(frozen=True)
class CondLayoutDiffusion(ContinuousDiffusion):
    """``apply_fn(params, box_t, condition_dict)``;
    ``cond_apply_fn(params, scenegraph_dict, rng) -> (latent, obj_embed)``."""

    cond_apply_fn: Callable[..., Any] = None

    def get_network_condition(
        self, params, t, input_dict, rng=None, only_custom: bool = False
    ) -> dict:
        """cf. ``continuous_layout_cond.py:71-79``."""
        latent, obj_embed = self.cond_apply_fn(params, input_dict["scenegraph"], rng)
        other = dict(
            preds=input_dict["scenegraph"]["triples"],
            uc_b=obj_embed,
            c_b=latent,
            edge_mask=input_dict["scenegraph"].get("edge_mask"),
        )
        if only_custom:
            return dict(other_condition=other)
        return dict(time_condition=self.log_snr(t), other_condition=other)

    def sample_timesteps(self, rng, scene_ids: jnp.ndarray, num_scenes: int):
        """One t per scene, gathered to nodes; cf. ``:54-59``."""
        t_scene = jax.random.uniform(rng, (num_scenes,), dtype=jnp.float32)
        return t_scene[scene_ids]

    def p_loss(
        self, params, rng, input_dict, t, loss_mask=None, model_kwargs=None
    ) -> jnp.ndarray:
        """cf. ``continuous_layout_cond.py:82-107``."""
        x_0 = input_dict["x_0"]
        loss_mask = jnp.ones_like(x_0) if loss_mask is None else loss_mask
        rng_q, rng_sg = jax.random.split(rng)
        x_t, noise = self.q_step_from_x_0(x_0, t, rng_q)
        condition = self.get_network_condition(params, t, input_dict, rng_sg)
        prediction = self.apply_fn(params, x_t, condition)
        target = self.get_target(x_0, t, noise)
        loss = self.criterion(prediction, target)
        axes = tuple(range(1, x_0.ndim))
        loss = jnp.sum(loss * loss_mask, axis=axes)
        denom = jnp.sum(loss_mask, axis=axes) + 1e-8
        return jnp.mean(loss / denom * self.get_loss_weight(t))

    def loss(
        self,
        params,
        rng,
        input_dict,
        num_scenes: int,
        model_kwargs=None,
    ) -> jnp.ndarray:
        """cf. ``forward`` (:145-159): x_0 = boxes[:, :20], mask = boxes[:, 20:]."""
        boxes = input_dict["boxes"]
        x_0 = boxes[:, :20]
        loss_mask = boxes[:, 20:]
        if loss_mask.shape[1] == 0:
            loss_mask = None
        elif loss_mask.shape[1] != x_0.shape[1]:
            loss_mask = jnp.broadcast_to(loss_mask[:, :1], x_0.shape)
        rng_t, rng_q = jax.random.split(rng)
        t = self.sample_timesteps(rng_t, input_dict["scene_ids"], num_scenes)
        d = dict(input_dict)
        d["x_0"] = x_0
        return self.p_loss(params, rng_q, d, t, loss_mask, model_kwargs)

    def p_step_cond(
        self, params, rng, x_t, condition_dict, t, s,
        mode: Literal["ddpm", "ddim"] = "ddpm", ddim_eta: float = 0.0,
    ):
        """cf. ``continuous_layout_cond.py:109-144`` (2D broadcast variant)."""
        from . import schedules

        log_snr_t = _bcast(self.log_snr(t), x_t.ndim)
        log_snr_s = _bcast(self.log_snr(s), x_t.ndim)
        alpha_t, sigma_t = schedules.log_snr_to_alpha_sigma(log_snr_t)
        alpha_s, sigma_s = schedules.log_snr_to_alpha_sigma(log_snr_s)
        cd = dict(condition_dict)
        cd["time_condition"] = self.log_snr(t)
        prediction = self.apply_fn(params, x_t, cd)
        if self.prediction_type == "eps":
            x_0 = (x_t - sigma_t * prediction) / alpha_t
        elif self.prediction_type == "v":
            x_0 = alpha_t * x_t - sigma_t * prediction
        else:
            x_0 = prediction
        if self.clip_sample:
            x_0 = jnp.clip(x_0, -self.clip_sample_range, self.clip_sample_range)
        noise = jax.random.normal(rng, x_t.shape, x_t.dtype)
        if mode == "ddpm":
            c = -jnp.expm1(log_snr_t - log_snr_s)
            mean = alpha_s * (x_t * (1 - c) / alpha_t + c * x_0)
            return mean + sigma_s * jnp.sqrt(c) * noise
        c_1 = ddim_eta * sigma_s / sigma_t * jnp.sqrt(1 - alpha_t**2 / alpha_s**2)
        c_2 = jnp.sqrt(1 - alpha_s**2 - c_1**2)
        eps = (x_t - alpha_t * x_0) / sigma_t
        return alpha_s * x_0 + c_1 * noise + c_2 * eps

    @partial(jax.jit, static_argnames=("self", "num_steps", "mode"))
    def sample(
        self,
        params,
        rng,
        input_dict: dict,
        num_steps: int,
        mode: Literal["ddpm", "ddim"] = "ddpm",
        ddim_eta: float = 0.0,
    ) -> jnp.ndarray:
        """cf. ``continuous_layout_cond.py:161-191``: generates the flat node
        batch (N, 20) conditioned on the scene graph."""
        N = input_dict["boxes"].shape[0]
        C = 20
        rng_init, rng_sg, rng_scan = jax.random.split(rng, 3)
        x = jax.random.normal(rng_init, (N, C), jnp.float32)
        d = dict(input_dict)
        d["x_0"] = input_dict["boxes"][:, :20]
        condition = self.get_network_condition(
            params, None, d, rng_sg, only_custom=True
        )["other_condition"]
        steps = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)

        def body(x, i):
            t = jnp.full((N,), steps[i])
            s = jnp.full((N,), steps[i + 1])
            x = self.p_step_cond(
                params, jax.random.fold_in(rng_scan, i), x,
                dict(other_condition=condition), t, s, mode=mode, ddim_eta=ddim_eta,
            )
            return x, None

        x, _ = jax.lax.scan(body, x, jnp.arange(num_steps))
        return x
