"""Training stack: EMA semantics, LR schedule parity, train-step smoke, dp/sp mesh."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.configs import get_config
from lidarcrafter_tpu.diffusion import ContinuousDiffusion
from lidarcrafter_tpu.models.efficient_unet import EfficientUNet
from lidarcrafter_tpu.parallel import batch_sharding, make_mesh, replicated_sharding
from lidarcrafter_tpu.training import (
    TrainState,
    cosine_warmup_schedule,
    ema_decay_schedule,
    ema_update,
    make_optimizer,
    make_train_step,
)


def test_lr_schedule_matches_reference_lambda():
    """Reference: lidargen/utils/training.py:14-22 (LambdaLR form)."""
    base_lr, warmup, total = 1e-4, 100, 1000
    sched = cosine_warmup_schedule(base_lr, warmup, total)

    def ref_lambda(step):
        if step < warmup:
            return step / max(1, warmup)
        progress = (step - warmup) / max(1, total - warmup)
        return max(0.0, 0.5 * (1.0 + math.cos(math.pi * 0.5 * 2.0 * progress)))

    for step in [0, 1, 50, 99, 100, 500, 999, 1000]:
        np.testing.assert_allclose(
            float(sched(step)), base_lr * ref_lambda(step), rtol=1e-5, atol=1e-11
        )


def test_ema_decay_schedule():
    """ema_pytorch semantics: copy until update_after_step, then ramp to beta."""
    assert float(ema_decay_schedule(jnp.asarray(0), update_after_step=10)) == 0.0
    assert float(ema_decay_schedule(jnp.asarray(10), update_after_step=10)) == 0.0
    assert float(ema_decay_schedule(jnp.asarray(11), update_after_step=10)) == 0.0
    d100 = float(ema_decay_schedule(jnp.asarray(100), beta=0.995, update_after_step=10))
    want = 1 - (1 + (100 - 10 - 1) / 1.0) ** (-2 / 3)
    np.testing.assert_allclose(d100, min(0.995, want), rtol=1e-5)
    d5000 = float(ema_decay_schedule(jnp.asarray(5000), beta=0.995, update_after_step=10))
    assert d5000 == pytest.approx(0.995)


def test_ema_update_copies_then_tracks():
    online = {"w": jnp.ones(4) * 2.0}
    ema = {"w": jnp.zeros(4)}
    # early step: copy
    out = ema_update(ema, online, jnp.asarray(0), update_every=1, update_after_step=10)
    np.testing.assert_allclose(np.asarray(out["w"]), 2.0)
    # late step: lerp with beta
    out = ema_update(
        {"w": jnp.zeros(4)}, online, jnp.asarray(10_000),
        beta=0.9, update_every=1, update_after_step=10,
    )
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9 * 0.0 + 0.1 * 2.0, rtol=1e-5)
    # off-cycle step: unchanged
    out = ema_update(
        {"w": jnp.zeros(4)}, online, jnp.asarray(10_001),
        beta=0.9, update_every=10, update_after_step=10,
    )
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0)


def _tiny_setup(resolution=(16, 32), batch=2):
    model = EfficientUNet(
        in_channels=2, resolution=resolution, base_channels=8,
        num_residual_blocks=(1, 1, 1, 1), gn_num_groups=4,
        coords_encoding=None, ring=True,
    )
    x = jnp.zeros((batch, *resolution, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((batch,)))
    engine = ContinuousDiffusion(
        apply_fn=lambda p, xt, lsnr: model.apply(p, xt, lsnr),
        sampling_shape=(*resolution, 2),
    )
    return model, params, engine


def test_train_step_runs_and_updates():
    _, params, engine = _tiny_setup()
    tx = make_optimizer(lr=1e-3, warmup_steps=1, num_steps=100)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(engine, tx, ema_update_after_step=0, donate=False)
    rng = jax.random.PRNGKey(7)
    x_0 = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 32, 2)) * 2 - 1
    losses = []
    for _ in range(3):
        state, loss = step_fn(state, x_0, rng)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert int(state.step) == 3
    # params must have moved
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, state.params, params),
        0.0,
    )
    assert diff > 0


def test_train_step_on_dp_sp_mesh():
    """8 virtual devices: batch over dp, azimuth over sp — the TPU-native DDP."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, sp=2)
    _, params, engine = _tiny_setup(batch=4)
    tx = make_optimizer(lr=1e-3, warmup_steps=1, num_steps=100)
    state = TrainState.create(params, tx)
    state = jax.device_put(state, replicated_sharding(mesh))
    x_0 = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 32, 2)) * 2 - 1
    x_0 = jax.device_put(x_0, batch_sharding(mesh, 4, sp_axis=2))
    step_fn = make_train_step(engine, tx, donate=False)
    state, loss = step_fn(state, x_0, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_config_registry():
    cfg = get_config("nuscenes-unet-uncond")
    assert cfg.data.resolution == (32, 1024)
    assert cfg.diffusion.num_sampling_steps == 1024
    assert cfg.model.architecture == "efficient_unet"
    assert cfg.training.ema_decay == 0.995


def test_layout_trainer_steps():
    """LayoutTrainer: two jitted steps on padded synthetic scene graphs."""
    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training.loop import LayoutTrainer, pad_layout_batch

    cfg = get_config("nuscenes-layout")
    cfg.model.params["model_channels"] = 32
    cfg.training.batch_size_train = 2

    rng = np.random.RandomState(0)

    def batches():
        while True:
            n, e = 8, 10
            dec = {
                "objs": rng.randint(0, 9, n),
                "boxes": rng.randn(n, 40).astype(np.float32),
                "tripltes": np.stack(
                    [rng.randint(0, n, e), rng.randint(0, 16, e), rng.randint(0, n, e)], 1
                ),
                "obj_to_scene": np.repeat([0, 1], n // 2),
                "text_feats": rng.randn(n, 512).astype(np.float32),
                "rel_feats": rng.randn(e, 512).astype(np.float32),
            }
            yield {"decoder": dec}

    trainer = LayoutTrainer(cfg, batches(), max_nodes=16, max_edges=24, log_fn=None)
    state = trainer.train(num_steps=2, checkpoint_every=0)
    assert int(jax.device_get(state.step)) == 2

    # padding semantics: pad nodes carry zero loss weight
    b = pad_layout_batch(next(batches()), 16, 24)
    assert b["boxes"].shape == (16, 40)
    assert float(jnp.abs(b["boxes"][8:]).max()) == 0.0
    assert not bool(b["scenegraph"]["edge_mask"][10])


def test_gradient_accumulation_equals_full_batch_step():
    """k accumulation micro-steps == 1 full-batch step on identical data
    (reference semantics: train_lidm.py:219-226, accelerator.accumulate)."""
    from types import SimpleNamespace

    k, B = 3, 2
    model, params, _ = _tiny_setup(batch=B)

    # deterministic engine: rng is ignored so micro/full grads are comparable
    engine = SimpleNamespace(
        loss=lambda p, rng, x0: jnp.mean(
            (model.apply(p, x0, jnp.zeros((x0.shape[0],))) - x0) ** 2
        )
    )

    micro = jax.random.normal(jax.random.PRNGKey(3), (k, B, 16, 32, 2))
    rng = jax.random.PRNGKey(0)

    tx_acc = make_optimizer(lr=1e-3, warmup_steps=1, num_steps=100,
                            grad_accum_steps=k)
    state_a = TrainState.create(params, tx_acc)
    step_a = make_train_step(engine, tx_acc, ema_update_after_step=0,
                             donate=False)
    for i in range(k):
        state_a, _ = step_a(state_a, micro[i], rng)
    assert int(state_a.step) == k  # micro-steps count like reference global_step

    tx_full = make_optimizer(lr=1e-3, warmup_steps=1, num_steps=100)
    state_f = TrainState.create(params, tx_full)
    step_f = make_train_step(engine, tx_full, ema_update_after_step=0,
                             donate=False)
    state_f, _ = step_f(state_f, micro.reshape(k * B, 16, 32, 2), rng)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        state_a.params, state_f.params,
    )

    # before the k-th micro-step no parameter update must have been applied
    state_b = TrainState.create(params, tx_acc)
    for i in range(k - 1):
        state_b, _ = step_a(state_b, micro[i], rng)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state_b.params, params,
    )
