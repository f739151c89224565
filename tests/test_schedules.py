"""Golden parity: diffusion schedules + engine formulas vs reference continuous_time.py."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.diffusion import ContinuousDiffusion, schedules
from tests.reference_loader import load_ref_diffusion

ref_ct = load_ref_diffusion()


@pytest.mark.parametrize(
    "name,ours,ref",
    [
        ("linear", schedules.log_snr_schedule_linear, ref_ct._log_snr_schedule_linear),
        ("cosine", schedules.log_snr_schedule_cosine, ref_ct._log_snr_schedule_cosine),
    ],
)
def test_log_snr_schedules(name, ours, ref):
    t = np.linspace(0.001, 0.999, 257).astype(np.float32)
    got = np.asarray(ours(jnp.asarray(t)))
    want = ref(torch.from_numpy(t)).squeeze().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_log_snr_shifted_and_interpolated():
    t = np.linspace(0.0, 1.0, 101).astype(np.float32)
    got = np.asarray(
        schedules.log_snr_schedule_cosine_shifted(jnp.asarray(t), image_d=64, noise_d=32)
    )
    want = (
        ref_ct._log_snr_schedule_cosine_shifted(torch.from_numpy(t), 64, 32)
        .squeeze()
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    got = np.asarray(
        schedules.log_snr_schedule_cosine_interpolated(
            jnp.asarray(t), image_d=64, noise_d_low=32, noise_d_high=128
        )
    )
    # The reference's interpolated schedule mis-broadcasts 1D t (t * (B,1,1,1)
    # -> (B,1,1,B)); test against the intended formula built from its own
    # shifted schedule: t * shifted(low) + (1-t) * shifted(high).
    lo = (
        ref_ct._log_snr_schedule_cosine_shifted(torch.from_numpy(t), 64, 32)
        .squeeze()
        .numpy()
    )
    hi = (
        ref_ct._log_snr_schedule_cosine_shifted(torch.from_numpy(t), 64, 128)
        .squeeze()
        .numpy()
    )
    want = t * lo + (1 - t) * hi
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_alpha_sigma():
    log_snr = np.linspace(-15, 15, 301).astype(np.float32)
    a, s = schedules.log_snr_to_alpha_sigma(jnp.asarray(log_snr))
    ra, rs = ref_ct._log_snr_to_alpha_sigma(torch.from_numpy(log_snr))
    np.testing.assert_allclose(np.asarray(a), ra.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), rs.numpy(), rtol=1e-5, atol=1e-6)


class _IdentityModel(torch.nn.Module):
    """Reference-side dummy denoiser: prediction = 0.5 * x_t."""

    resolution = (8, 16)
    in_channels = 2

    def forward(self, x, log_snr):
        return 0.5 * x


def _make_pair(prediction_type="eps"):
    ref_engine = ref_ct.ContinuousTimeGaussianDiffusion(
        model=_IdentityModel(),
        prediction_type=prediction_type,
        noise_schedule="cosine",
        min_snr_loss_weight=True,
        min_snr_gamma=5.0,
        clip_sample=True,
        clip_sample_range=1.0,
    )
    engine = ContinuousDiffusion(
        apply_fn=lambda params, x, log_snr: 0.5 * x,
        sampling_shape=(8, 16, 2),
        prediction_type=prediction_type,
        noise_schedule="cosine",
    )
    return engine, ref_engine


@pytest.mark.parametrize("prediction_type", ["eps", "v", "x_0"])
def test_p_step_parity(prediction_type):
    """Single reverse step with the same dummy model, same noise (zero eta ddim)."""
    engine, ref_engine = _make_pair(prediction_type)
    rng = np.random.RandomState(0)
    x_t = rng.randn(2, 8, 16, 2).astype(np.float32)
    t = np.array([0.8, 0.5], np.float32)
    s = np.array([0.7, 0.4], np.float32)

    ref_x = ref_engine.p_step(
        torch.from_numpy(x_t.transpose(0, 3, 1, 2)),
        torch.from_numpy(t),
        torch.from_numpy(s),
        mode="ddim",
        ddim_eta=0.0,
    ).numpy()

    ours = np.asarray(
        engine.p_step(
            None, jax.random.PRNGKey(0), jnp.asarray(x_t),
            jnp.asarray(t), jnp.asarray(s), mode="ddim", ddim_eta=0.0,
        )
    )
    np.testing.assert_allclose(
        ours.transpose(0, 3, 1, 2), ref_x, rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("prediction_type", ["eps", "v", "x_0"])
def test_loss_weight_and_target_parity(prediction_type):
    engine, ref_engine = _make_pair(prediction_type)
    t = np.linspace(0.01, 0.99, 17).astype(np.float32)
    want = ref_engine.get_loss_weight(torch.from_numpy(t)).squeeze().numpy()
    got = np.asarray(engine.get_loss_weight(jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    rng = np.random.RandomState(1)
    x0 = rng.randn(17, 4, 4, 1).astype(np.float32)
    noise = rng.randn(17, 4, 4, 1).astype(np.float32)
    want = ref_engine.get_target(
        torch.from_numpy(x0.transpose(0, 3, 1, 2)),
        torch.from_numpy(t),
        torch.from_numpy(noise.transpose(0, 3, 1, 2)),
    ).numpy()
    got = np.asarray(engine.get_target(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4)


def test_ddim_sample_runs_and_is_deterministic():
    engine, _ = _make_pair("eps")
    out1 = engine.sample(None, jax.random.PRNGKey(42), batch_size=2, num_steps=8, mode="ddim")
    out2 = engine.sample(None, jax.random.PRNGKey(42), batch_size=2, num_steps=8, mode="ddim")
    assert out1.shape == (2, 8, 16, 2)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_ddpm_sample_runs():
    engine, _ = _make_pair("eps")
    out = engine.sample(None, jax.random.PRNGKey(0), batch_size=1, num_steps=8, mode="ddpm")
    assert out.shape == (1, 8, 16, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_repaint_runs():
    engine, _ = _make_pair("eps")
    known = jnp.zeros((1, 8, 16, 2))
    mask = jnp.ones((1, 8, 16, 2)) * (jnp.arange(16)[None, None, :, None] < 8)
    out = engine.repaint(
        None, jax.random.PRNGKey(0), known, mask, num_steps=4,
        num_resample_steps=2, jump_length=2,
    )
    assert out.shape == (1, 8, 16, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_discrete_beta_schedules():
    """Discrete beta schedules vs the reference's discrete_time.py formulas."""
    import importlib.util, sys, types
    from pathlib import Path

    # reuse refdiff package installed by load_ref_diffusion
    spec = importlib.util.spec_from_file_location(
        "refdiff.discrete_time",
        Path("/root/reference/lidargen/models/diffusion/discrete_time.py"),
    )
    dt = importlib.util.module_from_spec(spec)
    sys.modules["refdiff.discrete_time"] = dt
    spec.loader.exec_module(dt)

    for T in (10, 1000):
        # JAX runs fp32 here (x64 disabled); tolerances are fp32-realistic.
        np.testing.assert_allclose(
            np.asarray(schedules.beta_schedule_linear(T), dtype=np.float64),
            dt._linear_beta_schedule(T).numpy(), rtol=1e-5, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(schedules.beta_schedule_cosine(T), dtype=np.float64),
            dt._cosine_beta_schedule(T).numpy(), rtol=1e-3, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(schedules.beta_schedule_sigmoid(T), dtype=np.float64),
            dt._sigmoid_beta_schedule(T).numpy(), rtol=1e-3, atol=2e-4,
        )
