"""Conditional continuous-time diffusion engine.

TPU-native re-design of ``lidargen/models/diffusion/continuous_time_cond.py:66-456``
(``CondContinuousTimeGaussianDiffusion``): extends :class:`ContinuousDiffusion`
with a condition model.  ``cond_mode='concat'`` concatenates the condition
channels onto the noisy input (``continuous_time_cond.py:108-113,223-228,
425-428``); ``w_loss_weight`` uses the per-scene loss-weight map as loss mask
(``:446-455``).

The condition encoder runs ONCE per sample call (outside the scan) and its
outputs are carried as scan constants — the reference recomputes nothing
either (``:268``), but here the whole loop is one XLA program.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Literal

import jax
import jax.numpy as jnp

from .continuous import ContinuousDiffusion, _bcast


@dataclasses.dataclass(frozen=True)
class CondContinuousDiffusion(ContinuousDiffusion):
    """``apply_fn(params, x_t, condition_dict) -> prediction`` where
    ``condition_dict = {'time_condition': (B,), 'other_condition': ...}``;
    ``cond_apply_fn(params, input_dict) -> other_condition``.
    """

    cond_apply_fn: Callable[..., Any] = None
    cond_mode: Literal["concat", None] = None
    w_loss_weight: bool = False

    def get_network_condition(
        self, params, t: jnp.ndarray | None, input_dict: dict, only_custom: bool = False
    ) -> dict:
        """cf. ``continuous_time_cond.py:146-152``."""
        other = self.cond_apply_fn(params, input_dict)
        if only_custom:
            return dict(other_condition=other)
        return dict(time_condition=self.log_snr(t), other_condition=other)

    def _model_forward(self, params, x_t, condition_dict):
        if self.cond_mode == "concat" and isinstance(
            condition_dict.get("other_condition"), jnp.ndarray
        ):
            feat = condition_dict["other_condition"]
            time_only = dict(time_condition=condition_dict["time_condition"])
            return self.apply_fn(
                params, jnp.concatenate([x_t, feat], axis=-1), time_only
            )
        return self.apply_fn(params, x_t, condition_dict)

    # ----------------------------------------------------------------- loss

    def p_loss(
        self,
        params: Any,
        rng: jax.Array,
        input_dict: dict,
        t: jnp.ndarray,
        loss_mask: jnp.ndarray | None = None,
        model_kwargs: dict | None = None,
    ) -> jnp.ndarray:
        """cf. ``continuous_time_cond.py:414-437``."""
        x_0 = input_dict["x_0"]
        loss_mask = jnp.ones_like(x_0) if loss_mask is None else loss_mask
        x_t, noise = self.q_step_from_x_0(x_0, t, rng)
        condition = self.get_network_condition(params, t, input_dict)
        if self.cond_mode == "concat" and isinstance(
            condition.get("other_condition"), jnp.ndarray
        ):
            feat = condition.pop("other_condition")
            x_t = jnp.concatenate([x_t, feat], axis=-1)
        prediction = self.apply_fn(params, x_t, condition)
        target = self.get_target(x_0, t, noise)
        loss = self.criterion(prediction, target)
        axes = tuple(range(1, x_0.ndim))
        loss = jnp.sum(loss * loss_mask, axis=axes)
        denom = jnp.sum(loss_mask, axis=axes) + 1e-8
        return jnp.mean(loss / denom * self.get_loss_weight(t))

    def loss(
        self,
        params: Any,
        rng: jax.Array,
        input_dict: dict,
        loss_mask: jnp.ndarray | None = None,
        model_kwargs: dict | None = None,
    ) -> jnp.ndarray:
        """cf. ``continuous_time_cond.py:439-456`` (forward)."""
        x_0 = input_dict["x_0"]
        rng_t, rng_q = jax.random.split(rng)
        t = jax.random.uniform(rng_t, (x_0.shape[0],), dtype=jnp.float32)
        if self.w_loss_weight and loss_mask is None:
            w = input_dict.get("scene_loss_weight_map")  # (B, H, W)
            if w is not None:
                loss_mask = jnp.broadcast_to(w[..., None], x_0.shape)
        return self.p_loss(params, rng_q, input_dict, t, loss_mask, model_kwargs)

    # ----------------------------------------------------------------- reverse

    def predict_x_0_cond(
        self,
        params: Any,
        x_t: jnp.ndarray,
        condition_dict: dict,
        t: jnp.ndarray,
    ) -> jnp.ndarray:
        """Conditioned x̂_0 from one denoiser call (shared by the ancestral
        steps and the DPM-Solver++ multistep path)."""
        from . import schedules

        log_snr_t = _bcast(self.log_snr(t), x_t.ndim)
        alpha_t, sigma_t = schedules.log_snr_to_alpha_sigma(log_snr_t)
        cd = dict(condition_dict)
        cd["time_condition"] = self.log_snr(t)
        prediction = self._model_forward(params, x_t, cd)
        if self.prediction_type == "eps":
            x_0 = (x_t - sigma_t * prediction) / alpha_t
        elif self.prediction_type == "v":
            x_0 = alpha_t * x_t - sigma_t * prediction
        elif self.prediction_type == "x_0":
            x_0 = prediction
        else:
            raise ValueError(self.prediction_type)
        if self.clip_sample:
            x_0 = jnp.clip(x_0, -self.clip_sample_range, self.clip_sample_range)
        return x_0

    def p_step_cond(
        self,
        params: Any,
        rng: jax.Array,
        x_t: jnp.ndarray,
        condition_dict: dict,
        t: jnp.ndarray,
        s: jnp.ndarray,
        mode: Literal["ddpm", "ddim"] = "ddpm",
        ddim_eta: float = 0.0,
    ) -> jnp.ndarray:
        """cf. ``continuous_time_cond.py:206-253``."""
        from . import schedules

        log_snr_t = _bcast(self.log_snr(t), x_t.ndim)
        log_snr_s = _bcast(self.log_snr(s), x_t.ndim)
        alpha_t, sigma_t = schedules.log_snr_to_alpha_sigma(log_snr_t)
        alpha_s, sigma_s = schedules.log_snr_to_alpha_sigma(log_snr_s)
        x_0 = self.predict_x_0_cond(params, x_t, condition_dict, t)
        noise = jax.random.normal(rng, x_t.shape, x_t.dtype)
        if mode == "ddpm":
            c = -jnp.expm1(log_snr_t - log_snr_s)
            mean = alpha_s * (x_t * (1 - c) / alpha_t + c * x_0)
            return mean + sigma_s * jnp.sqrt(c) * noise
        if mode == "ddim":
            c_1 = ddim_eta * sigma_s / sigma_t * jnp.sqrt(1 - alpha_t**2 / alpha_s**2)
            c_2 = jnp.sqrt(1 - alpha_s**2 - c_1**2)
            eps = (x_t - alpha_t * x_0) / sigma_t
            return alpha_s * x_0 + c_1 * noise + c_2 * eps
        raise ValueError(mode)

    @partial(
        jax.jit, static_argnames=(
            "self", "batch_size", "num_steps", "mode", "return_all", "dpmpp_spacing"
        )
    )
    def sample(
        self,
        params: Any,
        rng: jax.Array,
        batch_dict: dict,
        batch_size: int,
        num_steps: int,
        mode: Literal["ddpm", "ddim", "dpmpp_2m"] = "ddpm",
        ddim_eta: float = 0.0,
        return_all: bool = False,
        dpmpp_spacing: Literal["t", "lambda"] = "lambda",
    ) -> jnp.ndarray:
        """Conditioned sampling as one ``lax.scan``; cf.
        ``continuous_time_cond.py:255-281``."""
        rng_init, rng_scan = jax.random.split(rng)
        x = jax.random.normal(rng_init, (batch_size, *self.sampling_shape), jnp.float32)
        condition_dict = self.get_network_condition(
            params, None, batch_dict, only_custom=True
        )
        steps = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)

        if mode == "dpmpp_2m":
            from .continuous import dpmpp_2m_scan, lambda_spaced_timesteps

            if dpmpp_spacing == "lambda":
                steps = lambda_spaced_timesteps(self.log_snr, num_steps)

            def x0_fn(x, i):
                t = jnp.full((batch_size,), steps[i])
                return self.predict_x_0_cond(params, x, condition_dict, t)

            x_final, xs = dpmpp_2m_scan(
                x, steps, self.log_snr, x0_fn, return_all=return_all
            )
            if return_all:
                return jnp.concatenate([x[None], xs], axis=0)
            return x_final

        def body(x, i):
            t = jnp.full((batch_size,), steps[i])
            s = jnp.full((batch_size,), steps[i + 1])
            x = self.p_step_cond(
                params, jax.random.fold_in(rng_scan, i), x, condition_dict, t, s,
                mode=mode, ddim_eta=ddim_eta,
            )
            return x, x if return_all else None

        x_final, xs = jax.lax.scan(body, x, jnp.arange(num_steps))
        if return_all:
            return jnp.concatenate([x[None], xs], axis=0)
        return x_final

    @partial(
        jax.jit,
        static_argnames=("self", "num_steps", "num_resample_steps", "jump_length"),
    )
    def inpaint(
        self,
        params: Any,
        rng: jax.Array,
        known: jnp.ndarray,
        mask: jnp.ndarray,
        batch_dict: dict,
        num_steps: int,
        num_resample_steps: int = 1,
        jump_length: int = 1,
    ) -> jnp.ndarray:
        """Conditioned RePaint; cf. ``continuous_time_cond.py:283-353``."""
        assert num_resample_steps > 0 and jump_length > 0
        batch_size = known.shape[0]
        rng_init, rng_scan = jax.random.split(rng)
        x_t = jax.random.normal(rng_init, (batch_size, *self.sampling_shape), jnp.float32)
        condition_dict = self.get_network_condition(
            params, None, batch_dict, only_custom=True
        )
        steps = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)
        interp = jnp.linspace(0.0, 1.0, jump_length + 1, dtype=jnp.float32)
        ij = [(i, j) for i in range(num_steps) for j in range(num_resample_steps)]
        i_arr = jnp.array([i for i, _ in ij])
        j_arr = jnp.array([j for _, j in ij])
        last_j = num_resample_steps - 1

        def outer(x_t, idx):
            i, j = i_arr[idx], j_arr[idx]
            step_t, step_s = steps[i], steps[i + 1]
            r_steps = step_t + interp * (step_s - step_t)
            rng_ij = jax.random.fold_in(rng_scan, idx)

            def rev_body(x, k):
                r_t = jnp.full((batch_size,), r_steps[k])
                r_s = jnp.full((batch_size,), r_steps[k + 1])
                rk = jax.random.fold_in(rng_ij, k)
                known_s, _ = self.q_step_from_x_0(known, r_s, jax.random.fold_in(rk, 1))
                unknown_s = self.p_step_cond(
                    params, jax.random.fold_in(rk, 2), x, condition_dict, r_t, r_s,
                    mode="ddpm",
                )
                return mask * known_s + (1 - mask) * unknown_s, None

            x_s, _ = jax.lax.scan(rev_body, x_t, jnp.arange(jump_length))

            def fwd(x):
                def fwd_body(x, k_rev):
                    k = jump_length - k_rev
                    r_t = jnp.full((batch_size,), r_steps[k - 1])
                    r_s = jnp.full((batch_size,), r_steps[k])
                    return self.q_step(x, r_t, r_s, jax.random.fold_in(rng_ij, 100 + k)), None

                out, _ = jax.lax.scan(fwd_body, x, jnp.arange(jump_length))
                return out

            is_last = (i == num_steps - 1) | (j == last_j)
            return jnp.where(is_last, x_s, fwd(x_s)), x_s

        _, all_x_s = jax.lax.scan(outer, x_t, jnp.arange(len(ij)))
        return all_x_s[-1]
