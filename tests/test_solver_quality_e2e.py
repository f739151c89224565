"""Trained-model solver-quality smoke (VERDICT r4 task 6): ties the solver-level
DPM++(2M) certification (tests/test_dpmpp.py, bench.py::bench_solver_cert) to
actual sample METRICS through the repo's own eval chain.

Train a tiny-topology uncond diffusion model for a few hundred steps on a
synthetic structured distribution, sample the SAME checkpoint with DDIM@50 and
DPM++(2M)@25, push both sample sets through the evaluation metrics the eval
suite uses (Fréchet + squared-MMD on features, BEV occupancy JSD —
``metrics/distribution.py``, ``metrics/bev.py``; cf. reference
``tools/evaluation/evaluate_our.py:322-439``), and assert the two solvers'
metric values agree within the metric's own seed-to-seed noise (measured
in-test by re-sampling DDIM@50 with a different rng).
"""

import numpy as np

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.diffusion import ContinuousDiffusion
from lidarcrafter_tpu.metrics.bev import compute_jsd_2d, bev_occupancy_grid
from lidarcrafter_tpu.metrics.distribution import (
    compute_frechet_distance,
    compute_squared_mmd,
)
from lidarcrafter_tpu.models.efficient_unet import EfficientUNet
from lidarcrafter_tpu.training import TrainState, make_optimizer, make_train_step
from lidarcrafter_tpu.utils.synthetic import banded_range_image_batch

H, W = 16, 32


def _synthetic_batch(key, batch):
    """The SAME structured distribution bench_solver_cert trains on
    (``lidarcrafter_tpu/utils/synthetic.py``)."""
    return banded_range_image_batch(key, batch, H, W)


def _feats(x, proj):
    """Fixed-random-projection features (the --random-extractors analogue of
    the eval suite's frozen perceptual backbones)."""
    return np.asarray(x).reshape(x.shape[0], -1) @ proj


def _bev_hist(x):
    """Treat (depth, refl) channels as a planar point set and histogram it
    with the eval suite's occupancy-grid helper."""
    pts = np.asarray(x).reshape(x.shape[0], -1, 2) * 40.0  # to metric-ish range
    hists = []
    for cloud in pts:
        xyz = np.concatenate([cloud, np.zeros_like(cloud[:, :1])], axis=1)
        hists.append(np.asarray(bev_occupancy_grid(jnp.asarray(xyz))))
    return np.stack(hists).sum(0)


def test_train_then_sample_metric_parity_ddim50_vs_dpmpp25():
    model = EfficientUNet(
        in_channels=2, resolution=(H, W), base_channels=8,
        num_residual_blocks=(1, 1, 1, 1), gn_num_groups=4,
        coords_encoding=None, ring=True,
    )
    x = jnp.zeros((8, H, W, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((8,)))
    engine = ContinuousDiffusion(
        apply_fn=lambda p, xt, lsnr: model.apply(p, xt, lsnr),
        sampling_shape=(H, W, 2),
    )
    tx = make_optimizer(lr=2e-3, warmup_steps=10, num_steps=300)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(engine, tx, ema_update_after_step=0, donate=False)
    key = jax.random.PRNGKey(42)
    for i in range(300):
        key, kb, ks = jax.random.split(key, 3)
        state, loss = step_fn(state, _synthetic_batch(kb, 8), ks)
    assert np.isfinite(float(loss))

    trained = state.params
    B = 16
    real = np.asarray(_synthetic_batch(jax.random.PRNGKey(777), B))
    rng = jax.random.PRNGKey(9)
    ddim = np.asarray(
        engine.sample(trained, rng, batch_size=B, num_steps=50, mode="ddim")
    )
    dpmpp = np.asarray(
        engine.sample(trained, rng, batch_size=B, num_steps=25, mode="dpmpp_2m")
    )
    # seed-to-seed noise floor of the metric chain: same solver, other rng
    ddim_b = np.asarray(
        engine.sample(
            trained, jax.random.PRNGKey(10), batch_size=B, num_steps=50, mode="ddim"
        )
    )

    # 0) solver agreement at the sample level: both solve the SAME ODE from
    # the same x_T, so per-sample differences must sit far below the spread
    # between independent draws
    d_solver = np.abs(ddim - dpmpp).mean()
    d_seed = np.abs(ddim - ddim_b).mean()
    assert d_solver < 0.5 * d_seed, (d_solver, d_seed)

    # 1) Fréchet + squared-MMD through metrics/distribution.py
    proj = np.random.RandomState(0).randn(H * W * 2, 64).astype(np.float32)
    f_real = _feats(real, proj)
    frd_ddim = compute_frechet_distance(f_real, _feats(ddim, proj))
    frd_dpmpp = compute_frechet_distance(f_real, _feats(dpmpp, proj))
    frd_noise = abs(frd_ddim - compute_frechet_distance(f_real, _feats(ddim_b, proj)))
    assert abs(frd_ddim - frd_dpmpp) <= max(2.0 * frd_noise, 0.15 * frd_ddim), (
        frd_ddim, frd_dpmpp, frd_noise,
    )
    mmd_ddim = compute_squared_mmd(f_real, _feats(ddim, proj))
    mmd_dpmpp = compute_squared_mmd(f_real, _feats(dpmpp, proj))
    mmd_noise = abs(mmd_ddim - compute_squared_mmd(f_real, _feats(ddim_b, proj)))
    assert abs(mmd_ddim - mmd_dpmpp) <= max(2.0 * mmd_noise, 0.15 * abs(mmd_ddim)), (
        mmd_ddim, mmd_dpmpp, mmd_noise,
    )

    # 2) BEV occupancy JSD through metrics/bev.py
    h_real = _bev_hist(real)
    jsd_ddim = compute_jsd_2d(jnp.asarray(h_real), jnp.asarray(_bev_hist(ddim)))
    jsd_dpmpp = compute_jsd_2d(jnp.asarray(h_real), jnp.asarray(_bev_hist(dpmpp)))
    jsd_noise = abs(
        jsd_ddim - compute_jsd_2d(jnp.asarray(h_real), jnp.asarray(_bev_hist(ddim_b)))
    )
    assert abs(jsd_ddim - jsd_dpmpp) <= max(2.0 * jsd_noise, 0.15 * jsd_ddim), (
        jsd_ddim, jsd_dpmpp, jsd_noise,
    )
