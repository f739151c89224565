"""Trainer loop + checkpoint roundtrip + CLI smoke tests."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

REPO = Path(__file__).resolve().parent.parent


def _tiny_cfg():
    from lidarcrafter_tpu.configs import get_config

    cfg = get_config("nuscenes-unet-uncond")
    cfg.data.resolution = (16, 32)
    cfg.training.batch_size_train = 2
    cfg.model.params.update(base_channels=8, num_residual_blocks=(1, 1, 1, 1), gn_num_groups=4, coords_encoding=None)
    cfg.training.lr_warmup_steps = 2
    cfg.training.num_steps = 3
    return cfg


def _batches(cfg):
    rng = np.random.RandomState(0)
    H, W = cfg.data.resolution
    B = cfg.training.batch_size_train
    while True:
        depth = rng.uniform(0, 60, (B, H, W, 1)).astype(np.float32)
        yield {
            "depth": depth,
            "reflectance": rng.rand(B, H, W, 1).astype(np.float32),
        }


def test_trainer_runs_and_checkpoints(tmp_path):
    from lidarcrafter_tpu.training.loop import Trainer
    from lidarcrafter_tpu.training.checkpoint import restore_checkpoint

    from lidarcrafter_tpu.parallel import make_mesh

    cfg = _tiny_cfg()
    trainer = Trainer(
        cfg, _batches(cfg), mesh=make_mesh(n_devices=2), output_dir=str(tmp_path),
        log_fn=None,
    )
    state = trainer.train(num_steps=3, checkpoint_every=3)
    assert int(jax.device_get(state.step)) == 3
    ckpts = list(tmp_path.glob("ckpt_*"))
    assert len(ckpts) == 1

    template = trainer.init_state(jax.random.PRNGKey(0))
    restored, cfg_dict = restore_checkpoint(str(ckpts[0]), template)
    assert int(jax.device_get(restored.step)) == 3
    assert cfg_dict["training"]["num_steps"] == 3
    # params roundtrip exactly
    a = jax.tree_util.tree_leaves(jax.device_get(state.params))
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("tool", ["train.py", "generate.py", "evaluate.py"])
def test_cli_help(tool):
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / tool), "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "usage" in out.stdout.lower()


def test_flow_and_object_trainers():
    import jax.numpy as jnp

    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training.loop import FlowTrainer, ObjectTrainer

    # MeanFlow branch
    cfg = get_config("meanflow-nusc")
    cfg.data.resolution = (16, 32)
    cfg.model.params.update(base_channels=8, num_residual_blocks=(1, 1, 1, 1),
                            gn_num_groups=4, coords_encoding=None)
    cfg.training.lr_warmup_steps = 1

    def batches():
        rng = np.random.RandomState(0)
        while True:
            depth = rng.uniform(0, 60, (2, 16, 32, 1)).astype(np.float32)
            yield {"depth": depth, "reflectance": rng.rand(2, 16, 32, 1).astype(np.float32)}

    t = FlowTrainer(cfg, batches(), log_fn=None)
    state = t.train(num_steps=2)
    assert int(jax.device_get(state.step)) == 2
    # MeanFlow.sample takes no num_steps/mode — the preview must use the
    # 1-step signature instead of raising a (swallowed) TypeError
    imgs = t.preview_images(state, jax.random.PRNGKey(0))
    assert imgs and all(np.isfinite(np.asarray(v)).all() for v in imgs.values())

    # object branch
    cfg = get_config("nuscenes-object")
    cfg.data.num_samples = 32
    cfg.training.lr_warmup_steps = 1
    text = np.random.RandomState(1).randn(8, 512).astype(np.float32)

    def obatches():
        rng = np.random.RandomState(2)
        while True:
            yield {
                "fg_points": rng.randn(2, 32, 4).astype(np.float32),
                "fg_encoding_box": rng.randn(2, 6).astype(np.float32),
                "fg_class": rng.randint(0, 8, 2),
            }

    t = ObjectTrainer(cfg, obatches(), text, log_fn=None)
    state = t.train(num_steps=2)
    assert int(jax.device_get(state.step)) == 2


def test_trainer_observability(tmp_path):
    """A short run must emit step timings + lr to the tracker and render EMA
    sample previews (cf. train_lidm.py:173-198,237-244)."""
    import json

    from lidarcrafter_tpu.training.loop import Trainer
    from lidarcrafter_tpu.training.tracker import JsonlTracker

    from lidarcrafter_tpu.parallel import make_mesh

    cfg = _tiny_cfg()
    cfg.training.num_steps = 2
    tracker = JsonlTracker(str(tmp_path))
    trainer = Trainer(
        cfg, _batches(cfg), mesh=make_mesh(n_devices=2),
        output_dir=str(tmp_path), log_fn=None,
        tracker=tracker, preview_num_steps=2, preview_batch_size=1,
    )
    trainer.train(num_steps=2, checkpoint_every=0, preview_every=2, log_every=1)
    tracker.close()

    events = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    assert {e["step"] for e in events} >= {1, 2}
    for key in ("loss", "lr", "sec_per_step"):
        assert key in events[0], events[0]
    pngs = list((tmp_path / "images").rglob("*.png"))
    tags = {p.stem for p in pngs}
    assert {"sample_depth", "sample_bev", "sample_reflectance"} <= tags, tags


def test_render_sample_images_shapes():
    import jax.numpy as jnp

    from lidarcrafter_tpu.training.tracker import render_sample_images
    from lidarcrafter_tpu.utils.lidar import LiDARUtility

    lu = LiDARUtility.create((8, 16), "log_depth", 1.45, 80.0, fov_up=10.0,
                             fov_down=-30.0)
    x = jnp.zeros((2, 8, 16, 2))
    out = render_sample_images(x, lu, bev_size=32)
    for tag in ("sample/depth", "sample/depth_orig", "sample/mask",
                "sample/bev", "sample/reflectance"):
        assert tag in out
        assert out[tag].dtype == np.uint8
    assert out["sample/depth"].shape == (2, 8, 16, 3)
    assert out["sample/bev"].shape == (2, 32, 32, 3)
