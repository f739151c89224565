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


def test_train_step_amp_bf16_master_params_f32():
    """AMP step (bf16 model fwd/bwd, f32 master params — the reference's
    fp16 Accelerate analogue, ``option_unet_nusc.py:49``): params/opt state
    stay f32, the loss tracks the fp32 step to bf16 resolution, and params
    move."""
    _, params, engine = _tiny_setup()
    tx = make_optimizer(lr=1e-3, warmup_steps=1, num_steps=100)
    state_amp = TrainState.create(params, tx)
    state_f32 = TrainState.create(params, tx)
    step_amp = make_train_step(engine, tx, donate=False, amp=True)
    step_f32 = make_train_step(engine, tx, donate=False, amp=False)
    rng = jax.random.PRNGKey(7)
    x_0 = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 32, 2)) * 2 - 1
    for _ in range(3):  # step 0 is zero-LR under the warmup schedule
        state_amp, loss_amp = step_amp(state_amp, x_0, rng)
        state_f32, loss_f32 = step_f32(state_f32, x_0, rng)
    assert np.isfinite(float(loss_amp))
    # same rng stream → the AMP loss is the bf16 rendering of the f32 loss
    np.testing.assert_allclose(
        float(loss_amp), float(loss_f32), rtol=0.05, atol=0.02
    )
    # master params and optimizer state remain f32 and have moved
    leaves = jax.tree_util.tree_leaves(state_amp.params)
    assert all(a.dtype == jnp.float32 for a in leaves)
    moved = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, state_amp.params, params),
        0.0,
    )
    assert moved > 0


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


def test_train_save_resume_equals_uninterrupted(tmp_path):
    """train k → save → resume → train k  ==  train 2k on identical data
    (VERDICT r2 #4; reference restores weights/EMA/optimizer/global_step,
    train_lidm.py:294-300)."""
    from lidarcrafter_tpu.training.checkpoint import restore_checkpoint, save_checkpoint

    k, B = 3, 2
    model, params, _ = _tiny_setup(batch=B)
    from types import SimpleNamespace

    engine = SimpleNamespace(
        loss=lambda p, rng, x0: jnp.mean(
            (model.apply(p, x0, jnp.zeros((x0.shape[0],))) - x0) ** 2
        )
    )
    data = jax.random.normal(jax.random.PRNGKey(9), (2 * k, B, 16, 32, 2))
    rng = jax.random.PRNGKey(1)
    tx = make_optimizer(lr=1e-3, warmup_steps=2, num_steps=100)
    step = make_train_step(engine, tx, ema_update_after_step=0, donate=False)

    # uninterrupted 2k steps
    ref = TrainState.create(params, tx)
    for i in range(2 * k):
        ref, _ = step(ref, data[i], rng)

    # k steps → checkpoint → restore → k more
    a = TrainState.create(params, tx)
    for i in range(k):
        a, _ = step(a, data[i], rng)
    ckpt = tmp_path / "ckpt_0000000003"
    save_checkpoint(str(ckpt), a)
    b, _ = restore_checkpoint(str(ckpt), TrainState.create(params, tx))
    assert int(b.step) == k  # global step restored
    for i in range(k, 2 * k):
        b, _ = step(b, data[i], rng)

    for name, ga, gb in (
        ("params", ref.params, b.params),
        ("ema", ref.ema_params, b.ema_params),
    ):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7
            ),
            ga, gb,
        )
    # optimizer state (incl. Adam moments + schedule count) identical
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7
        ),
        ref.opt_state, b.opt_state,
    )


def test_layout_trainer_reference_batch_worst_case():
    """Reference batch_size_train=2 with 14-node scenes and the quadratic
    relationship count (prepare_nusc_layout_dataset.py:22-66) must train
    WITHOUT crashing: budgets derive from config, overflow re-pads
    (VERDICT r2 weak #5)."""
    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training.loop import (
        EDGES_PER_SCENE,
        LayoutTrainer,
    )

    cfg = get_config("nuscenes-layout")
    cfg.model.params["model_channels"] = 32
    cfg.training.batch_size_train = 2

    rng = np.random.RandomState(3)

    def worst_case_batches():
        while True:
            # 14 nodes/scene × 2 scenes; every ordered pair of objects emits
            # relationships like the converter's quadratic rule set
            n_per, scenes = 14, 2
            n = n_per * scenes
            trip = []
            for s in range(scenes):
                base = s * n_per
                for i in range(1, n_per):
                    for j in range(i + 1, n_per):
                        for r in range(5):
                            trip.append([base + i, rng.randint(0, 16), base + j])
                    trip.append([base + i, rng.randint(0, 16), base])
            e = len(trip)
            dec = {
                "objs": rng.randint(0, 9, n),
                "boxes": rng.randn(n, 40).astype(np.float32),
                "tripltes": np.asarray(trip),
                "obj_to_scene": np.repeat([0, 1], n_per),
                "text_feats": rng.randn(n, 512).astype(np.float32),
                "rel_feats": rng.randn(e, 512).astype(np.float32),
            }
            yield {"decoder": dec}

    # no explicit budgets: derived from config (2 × 14 nodes, 2 × 442 edges)
    trainer = LayoutTrainer(cfg, worst_case_batches(), log_fn=None)
    assert trainer.max_nodes >= 28
    assert trainer.max_edges >= 2 * EDGES_PER_SCENE
    state = trainer.train(num_steps=1, checkpoint_every=0)
    assert int(jax.device_get(state.step)) == 1


def test_layout_trainer_overflow_grows_budgets():
    """A batch exceeding the static budgets re-pads and recompiles instead of
    raising (grow-and-recompile policy)."""
    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training.loop import LayoutTrainer

    cfg = get_config("nuscenes-layout")
    cfg.model.params["model_channels"] = 32
    cfg.training.batch_size_train = 2
    rng = np.random.RandomState(4)

    def batches(n, e):
        while True:
            dec = {
                "objs": rng.randint(0, 9, n),
                "boxes": rng.randn(n, 40).astype(np.float32),
                "tripltes": np.stack(
                    [rng.randint(0, n, e), rng.randint(0, 16, e),
                     rng.randint(0, n, e)], 1),
                "obj_to_scene": np.repeat([0, 1], n // 2),
                "text_feats": rng.randn(n, 512).astype(np.float32),
                "rel_feats": rng.randn(e, 512).astype(np.float32),
            }
            yield {"decoder": dec}

    trainer = LayoutTrainer(cfg, batches(24, 40), max_nodes=16, max_edges=24,
                            log_fn=None)
    b = trainer.prepare_batch(next(trainer.data_iter))
    assert trainer.max_nodes == 24 and trainer.max_edges == 40
    assert b["boxes"].shape[0] == 24
