"""DPM-Solver++(2M) sampler mode (``diffusion/continuous.py::dpmpp_2m_scan``).

The solver is an addition beyond the reference (DDPM/DDIM only,
``lidargen/models/diffusion/continuous_time.py:194-259``), so there is no
golden to execute — correctness is pinned structurally instead:

- a single step (no multistep history) must equal the DDIM(eta=0) step
  exactly (both are the exact solution under a locally-constant x̂_0);
- on a curved probability-flow ODE (x̂_0 varying with t), the second-order
  solver at N steps must be markedly closer to a fine-grid reference
  trajectory than first-order DDIM at the same N.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidarcrafter_tpu.diffusion import ContinuousDiffusion
from lidarcrafter_tpu.diffusion.conditional import CondContinuousDiffusion

SHAPE = (4, 8, 2)


def _engine(apply_fn, **kw):
    return ContinuousDiffusion(
        apply_fn=apply_fn,
        sampling_shape=SHAPE,
        prediction_type="x_0",
        clip_sample=False,
        **kw,
    )


def _curved_apply(params, x_t, log_snr, **_):
    # x̂_0 depends on both x_t and t (through log_snr): the flow ODE has
    # curvature, so solver order is visible in the discretisation error.
    s = jax.nn.sigmoid(log_snr).reshape((-1,) + (1,) * (x_t.ndim - 1))
    return 0.4 * jnp.tanh(x_t) + 0.3 * s - 0.1


def _t_only_apply(params, x_t, log_snr, **_):
    # x̂_0 a pure (curved) function of t: the flow ODE is linear in x, so
    # the discretisation error isolates the solver's quadrature order.
    s = jax.nn.sigmoid(log_snr).reshape((-1,) + (1,) * (x_t.ndim - 1))
    return (0.6 * s - 0.2) * jnp.ones_like(x_t)


def test_single_step_equals_ddim():
    # Both solvers take the identical exact-linear step when there is no
    # multistep history.  Tolerance is set by DDIM's own
    # ``sqrt(1 - alpha_s**2)`` cancellation at the clamped log-SNR endpoint
    # (~1e-4 in fp32); the dpmpp path computes sigma directly from log-SNR.
    eng = _engine(_curved_apply)
    rng = jax.random.PRNGKey(0)
    a = eng.sample(None, rng, batch_size=2, num_steps=1, mode="dpmpp_2m")
    b = eng.sample(None, rng, batch_size=2, num_steps=1, mode="ddim", ddim_eta=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=3e-4)


def test_second_order_convergence():
    """Doubling the step count must shrink the dpmpp discretisation error
    by ~4x (second order); a broken 2M correction degrades to ~2x.
    Measured against a 4096-step fine-grid solution of a flow ODE whose
    x̂_0 is a curved pure function of t (isolates quadrature order).

    Pinned to the uniform-t grid: on the default uniform-λ grid this ODE's
    error is already at the fine-grid reference's own error floor by n=32
    (~9e-5, >10x below the t-grid), so no order is measurable there — the
    λ-grid's accuracy is asserted separately below."""
    eng = _engine(_t_only_apply)
    rng = jax.random.PRNGKey(1)
    ref = np.asarray(
        eng.sample(None, rng, batch_size=2, num_steps=4096, mode="ddim")
    )

    def err(n, mode="dpmpp_2m"):
        out = np.asarray(
            eng.sample(None, rng, batch_size=2, num_steps=n, mode=mode,
                       dpmpp_spacing="t")
        )
        return np.abs(out - ref).mean()

    e32, e64, e128 = err(32), err(64), err(128)
    assert e32 / e64 > 2.6, (e32, e64)
    assert e64 / e128 > 2.6, (e64, e128)


def test_lambda_grid_beats_t_grid_floor():
    """The default uniform-λ grid must sit far below the uniform-t grid's
    error at matched step count on a curved flow (measured: ~10-30x on the
    toy ODEs, 5.4x on the trained production stack — BASELINE.md round 5)."""
    eng = _engine(_curved_apply)
    rng = jax.random.PRNGKey(1)
    ref = np.asarray(
        eng.sample(None, rng, batch_size=2, num_steps=4096, mode="ddim")
    )

    def err(n, sp):
        out = np.asarray(
            eng.sample(None, rng, batch_size=2, num_steps=n, mode="dpmpp_2m",
                       dpmpp_spacing=sp)
        )
        return np.abs(out - ref).mean()

    assert err(32, "lambda") < 0.2 * err(32, "t"), (err(32, "lambda"), err(32, "t"))
    # grid endpoints coincide, so the two spacings agree trivially at n=1
    a = np.asarray(eng.sample(None, rng, batch_size=2, num_steps=1,
                              mode="dpmpp_2m", dpmpp_spacing="lambda"))
    b = np.asarray(eng.sample(None, rng, batch_size=2, num_steps=1,
                              mode="dpmpp_2m", dpmpp_spacing="t"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_beats_ddim_on_curved_flow():
    """At moderate fast-sampling budgets the multistep correction must pay
    off on an x-dependent flow (the realistic case)."""
    eng = _engine(_curved_apply)
    rng = jax.random.PRNGKey(1)
    ref = np.asarray(
        eng.sample(None, rng, batch_size=2, num_steps=4096, mode="ddim")
    )

    def err(n, mode):
        out = np.asarray(
            eng.sample(None, rng, batch_size=2, num_steps=n, mode=mode)
        )
        return np.abs(out - ref).mean()

    assert err(64, "dpmpp_2m") < err(64, "ddim")
    assert err(128, "dpmpp_2m") < err(128, "ddim")


def test_lambda_grid_valid_for_all_schedules():
    """The dense-table inversion must produce a strictly decreasing t grid
    with pinned endpoints and uniform λ spacing for every noise schedule,
    including the non-analytically-invertible interpolated one."""
    from functools import partial

    from lidarcrafter_tpu.diffusion import schedules
    from lidarcrafter_tpu.diffusion.continuous import lambda_spaced_timesteps

    fns = {
        "linear": schedules.log_snr_schedule_linear,
        "cosine": schedules.log_snr_schedule_cosine,
        "cosine_shifted": partial(
            schedules.log_snr_schedule_cosine_shifted, image_d=64.0, noise_d=32.0
        ),
        "cosine_interpolated": partial(
            schedules.log_snr_schedule_cosine_interpolated,
            image_d=64.0, noise_d_low=32.0, noise_d_high=128.0,
        ),
    }
    for name, fn in fns.items():
        g = np.asarray(lambda_spaced_timesteps(fn, 25))
        assert g[0] == 1.0 and g[-1] == 0.0, (name, g[[0, -1]])
        assert np.all(np.diff(g) < 0), name
        lam = 0.5 * np.asarray(fn(jnp.asarray(g)))
        dlam = np.diff(lam)
        # uniform within interpolation error of the 4096-entry table
        assert np.all(np.abs(dlam - dlam.mean()) < 0.05 * abs(dlam.mean())), (
            name, dlam,
        )


def test_return_all_shape_and_determinism():
    eng = _engine(_curved_apply)
    rng = jax.random.PRNGKey(2)
    traj = eng.sample(
        None, rng, batch_size=3, num_steps=5, mode="dpmpp_2m", return_all=True
    )
    assert traj.shape == (6, 3, *SHAPE)
    again = eng.sample(None, rng, batch_size=3, num_steps=5, mode="dpmpp_2m")
    np.testing.assert_array_equal(np.asarray(traj[-1]), np.asarray(again))
    assert np.isfinite(np.asarray(traj)).all()


@pytest.mark.parametrize("pred_type", ["eps", "v"])
def test_prediction_type_consistency(pred_type):
    """All parameterisations of the same underlying x̂_0 give the same
    dpmpp trajectory (the solver consumes predict_x_0 output only)."""

    def as_pred(params, x_t, log_snr, **kw):
        from lidarcrafter_tpu.diffusion import schedules

        x0 = _curved_apply(params, x_t, log_snr)
        ls = log_snr.reshape((-1,) + (1,) * (x_t.ndim - 1))
        alpha, sigma = schedules.log_snr_to_alpha_sigma(ls)
        eps = (x_t - alpha * x0) / sigma
        if pred_type == "eps":
            return eps
        return alpha * eps - sigma * x0  # v

    rng = jax.random.PRNGKey(3)
    base = _engine(_curved_apply)
    other = ContinuousDiffusion(
        apply_fn=as_pred, sampling_shape=SHAPE,
        prediction_type=pred_type, clip_sample=False,
    )
    a = np.asarray(base.sample(None, rng, batch_size=2, num_steps=6, mode="dpmpp_2m"))
    b = np.asarray(other.sample(None, rng, batch_size=2, num_steps=6, mode="dpmpp_2m"))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_25step_dpmpp_beats_50step_ddim_on_network_ode():
    """Product-path certification (VERDICT r3 task 1d): DPM++(2M) at 25
    steps must have LOWER probability-flow-ODE solver error than DDIM at 50
    steps, measured against a 2048-step DDIM fine-grid solution of the SAME
    ODE, with the denoiser a real (random-weight, clipped-x0, v-pred) conv
    net — the flagship sampler's configuration.  Since both samplers are
    deterministic solvers of the identical ODE, matching-or-better solver
    accuracy at 25 steps preserves any sample-quality metric achieved at 50
    DDIM steps; bench.py reports the 25-step rate as the product fast path."""
    import flax.linen as nn

    class TinyUNet(nn.Module):
        @nn.compact
        def __call__(self, x, log_snr):
            t = jax.nn.sigmoid(log_snr).reshape(-1, 1, 1, 1)
            h = jnp.concatenate([x, jnp.broadcast_to(t, x.shape[:3] + (1,))], -1)
            h = nn.Conv(16, (3, 3))(h)
            h = nn.silu(h)
            h = nn.Conv(16, (3, 3))(h)
            h = nn.silu(h)
            return nn.Conv(2, (3, 3))(h)

    model = TinyUNet()
    x0 = jnp.zeros((1, 8, 32, 2))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)))

    eng = ContinuousDiffusion(
        apply_fn=lambda p, x_t, log_snr, **_: model.apply(p, x_t, log_snr),
        sampling_shape=(8, 32, 2),
        prediction_type="v",
        clip_sample=True,
    )
    rng = jax.random.PRNGKey(5)
    ref = np.asarray(
        eng.sample(params, rng, batch_size=2, num_steps=2048, mode="ddim")
    )

    def err(n, mode):
        out = np.asarray(
            eng.sample(params, rng, batch_size=2, num_steps=n, mode=mode)
        )
        return np.abs(out - ref).mean()

    e_ddim50 = err(50, "ddim")
    # default (uniform-λ) grid — the product path's configuration
    e_dpm25 = err(25, "dpmpp_2m")
    assert e_dpm25 < e_ddim50, (e_dpm25, e_ddim50)
    # the uniform-t grid's margins on THIS toy (a 6-seed sweep, BASELINE.md
    # round 4: @25 ~11x, @20 ~7x below ddim@50) — this random-weight conv
    # ODE's curvature lives mid-λ, where uniform-t resolves finer
    for n in (20, 25):
        e = np.abs(np.asarray(eng.sample(
            params, rng, batch_size=2, num_steps=n, mode="dpmpp_2m",
            dpmpp_spacing="t",
        )) - ref).mean()
        assert e < e_ddim50, (n, e, e_ddim50)
    # the @20 product-path margin on the TRAINED PRODUCTION stack is
    # certified on-chip instead: bench.py::bench_solver_cert measures
    # λ-grid dpmpp@20 at 2.0x (and @25 at 3.3x) BELOW ddim@50 there, where
    # the t-grid loses to ddim@50 (BASELINE.md round 5) — grid choice is
    # ODE-dependent and the engine default follows the production evidence.


def test_conditional_engine_dpmpp():
    """The conditioned engine's dpmpp path threads the condition dict into
    every denoiser call and matches its own DDIM at one step."""

    def apply_fn(params, x_t, cd):
        shift = cd["other_condition"]["shift"]
        s = jax.nn.sigmoid(cd["time_condition"]).reshape(
            (-1,) + (1,) * (x_t.ndim - 1)
        )
        return 0.4 * jnp.tanh(x_t) + 0.3 * s + shift

    eng = CondContinuousDiffusion(
        apply_fn=apply_fn,
        sampling_shape=SHAPE,
        prediction_type="x_0",
        clip_sample=False,
        cond_apply_fn=lambda params, d: d["custom_condition"],
    )
    batch = {"custom_condition": {"shift": jnp.float32(0.05)}}
    rng = jax.random.PRNGKey(4)
    a = eng.sample(None, rng, batch, batch_size=2, num_steps=1, mode="dpmpp_2m")
    b = eng.sample(None, rng, batch, batch_size=2, num_steps=1, mode="ddim")
    # same endpoint-cancellation tolerance as test_single_step_equals_ddim
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=3e-4)
    out = eng.sample(None, rng, batch, batch_size=2, num_steps=8, mode="dpmpp_2m")
    assert np.isfinite(np.asarray(out)).all()
