"""Discrete-time engine parity vs reference formulas + MeanFlow semantics."""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.diffusion import DiscreteDiffusion, MeanFlow
from lidarcrafter_tpu.models import MFEfficientUNet


def _load_ref_discrete():
    pkg = types.ModuleType("refdiff3")
    pkg.__path__ = [str(Path("/root/reference/lidargen/models/diffusion"))]
    sys.modules["refdiff3"] = pkg
    for name in ("base", "discrete_time"):
        spec = importlib.util.spec_from_file_location(
            f"refdiff3.{name}",
            Path(f"/root/reference/lidargen/models/diffusion/{name}.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refdiff3.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return sys.modules["refdiff3.discrete_time"]


ref_dt = _load_ref_discrete()


class _IdModel(torch.nn.Module):
    resolution = (8, 16)
    in_channels = 2

    def forward(self, x, steps):
        return 0.5 * x


def _pair(prediction_type="eps", schedule="linear", T=100):
    ref = ref_dt.DiscreteTimeGaussianDiffusion(
        model=_IdModel(),
        prediction_type=prediction_type,
        num_training_steps=T,
        noise_schedule=schedule,
    )
    ours = DiscreteDiffusion(
        apply_fn=lambda p, x, s: 0.5 * x,
        sampling_shape=(8, 16, 2),
        num_training_steps=T,
        prediction_type=prediction_type,
        noise_schedule=schedule,
    )
    return ours, ref


@pytest.mark.parametrize("prediction_type", ["eps", "v", "x_0"])
@pytest.mark.parametrize("mode", ["ddpm", "ddim"])
def test_discrete_p_step_parity(prediction_type, mode):
    ours, ref = _pair(prediction_type)
    r = np.random.RandomState(0)
    x_t = r.randn(3, 8, 16, 2).astype(np.float32)
    steps = np.array([0, 13, 77])

    kwargs = {"mode": mode}
    want = ref.p_step(
        torch.from_numpy(x_t.transpose(0, 3, 1, 2)), torch.from_numpy(steps), **kwargs
    ).numpy()
    got = np.asarray(
        ours.p_step(None, jax.random.PRNGKey(0), jnp.asarray(x_t), jnp.asarray(steps), mode=mode)
    )
    # DDPM adds noise except at step 0; compare the deterministic rows & means
    if mode == "ddim":
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-3, atol=1e-4)
    else:
        np.testing.assert_allclose(
            got[0].transpose(2, 0, 1), want[0], rtol=1e-3, atol=1e-4
        )  # step==0: no noise


@pytest.mark.parametrize("prediction_type", ["eps", "v", "x_0"])
def test_discrete_loss_weight_and_target(prediction_type):
    ours, ref = _pair(prediction_type, schedule="cosine")
    steps = np.array([0, 5, 50, 99])
    want = ref.get_loss_weight(torch.from_numpy(steps)).squeeze().numpy()
    got = np.asarray(ours.get_loss_weight(jnp.asarray(steps)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    r = np.random.RandomState(1)
    x0 = r.randn(4, 4, 4, 1).astype(np.float32)
    noise = r.randn(4, 4, 4, 1).astype(np.float32)
    want = ref.get_target(
        torch.from_numpy(x0.transpose(0, 3, 1, 2)), torch.from_numpy(steps),
        torch.from_numpy(noise.transpose(0, 3, 1, 2)),
    ).numpy()
    got = np.asarray(ours.get_target(jnp.asarray(x0), jnp.asarray(steps), jnp.asarray(noise)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-3, atol=1e-4)


def test_discrete_sample_runs():
    ours, _ = _pair("eps")
    out = ours.sample(None, jax.random.PRNGKey(0), batch_size=2, num_steps=10, mode="ddim")
    assert out.shape == (2, 8, 16, 2)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------------------ MeanFlow


def test_meanflow_loss_and_jvp_target():
    """With a linear model u(z,t,r) = A z, du/dt along tangent v is A v, so
    u_tgt = v − (t−r)·A v — check the engine reproduces the closed form."""
    A = 0.3

    def apply_fn(params, z, t, r):
        return A * z

    mf = MeanFlow(apply_fn=apply_fn, sampling_shape=(4, 8, 1), flow_ratio=0.0)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 4, 8, 1))
    loss, mse = mf.loss(None, rng, x)
    assert np.isfinite(float(loss)) and np.isfinite(float(mse))

    # closed-form check of the target math
    rng_tr, rng_e = jax.random.split(rng)
    t, r = mf.sample_t_r(rng_tr, 6)
    t_ = t.reshape(6, 1, 1, 1)
    r_ = r.reshape(6, 1, 1, 1)
    e = jax.random.normal(rng_e, x.shape, x.dtype)
    z = (1 - t_) * x + t_ * e
    v = e - x
    u = A * z
    u_tgt = v - (t_ - r_) * (A * v)
    error = u - u_tgt
    from lidarcrafter_tpu.diffusion.mean_flow import adaptive_l2_loss

    want = float(adaptive_l2_loss(error))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_meanflow_time_sampling_flow_ratio():
    mf = MeanFlow(apply_fn=lambda p, z, t, r: z, sampling_shape=(4,), flow_ratio=0.5)
    t, r = mf.sample_t_r(jax.random.PRNGKey(0), 64)
    t, r = np.asarray(t), np.asarray(r)
    assert (r <= t + 1e-7).all()
    assert (t >= 0).all() and (t <= 1).all()
    assert np.sum(np.isclose(r, t)) >= 32  # flow_ratio half get r = t


def test_mf_efficient_unet_forward():
    model = MFEfficientUNet(
        in_channels=2, resolution=(16, 32), base_channels=8,
        num_residual_blocks=(1, 1, 1, 1), gn_num_groups=4,
        coords_encoding=None, ring=True,
    )
    x = jnp.zeros((2, 16, 32, 2))
    t = jnp.array([0.5, 0.2])
    r = jnp.array([0.1, 0.2])
    params = model.init(jax.random.PRNGKey(0), x, t, r)
    out = jax.jit(lambda p, x, t, r: model.apply(p, x, t, r))(params, x, t, r)
    assert out.shape == (2, 16, 32, 2)

    mf = MeanFlow(
        apply_fn=lambda p, z, t, r: model.apply(p, z, t, r),
        sampling_shape=(16, 32, 2),
    )
    loss, mse = mf.loss(params, jax.random.PRNGKey(2), jnp.zeros((2, 16, 32, 2)))
    assert np.isfinite(float(loss))
    sample = mf.sample(params, jax.random.PRNGKey(3), batch_size=1)
    assert sample.shape == (1, 16, 32, 2)
