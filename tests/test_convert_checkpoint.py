"""tools/convert_checkpoint.py: reference .pth → orbax, end-to-end.

Builds the REFERENCE torch EfficientUNet at a tiny topology, saves a
reference-format checkpoint dict ({'weights', 'ema_weights', 'cfg'},
``train_lidm.py:249-259`` with the engine's ``model.`` key nesting), runs the
converter CLI with ``--set`` topology overrides, restores the orbax output
through the same template the sampling CLIs build, and asserts the restored
forward matches the torch EMA model numerically — proving EMA selection,
engine-prefix stripping, config-driven dispatch, shape validation, and the
orbax round-trip in one pass.
"""

import importlib.util
import os
import subprocess
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")

H, W = 32, 64
TINY = dict(
    base_channels=16,
    channel_multiplier=(1, 2, 4, 8),
    num_residual_blocks=(1, 1, 1, 1),
    gn_num_groups=4,
    attn_num_heads=4,
    coords_encoding="fourier_features",
    ring=True,
)


def _load_ref_efficient_unet():
    pkg = types.ModuleType("refunets_cc")
    pkg.__path__ = [str(REF / "lidargen/models/unets")]
    sys.modules["refunets_cc"] = pkg
    for name in ("encoding", "ops", "efficient_unet"):
        spec = importlib.util.spec_from_file_location(
            f"refunets_cc.{name}", REF / f"lidargen/models/unets/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refunets_cc.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return sys.modules["refunets_cc.efficient_unet"]


@pytest.fixture(scope="module")
def ref_ckpt(tmp_path_factory):
    ref_eu = _load_ref_efficient_unet()
    torch.manual_seed(3)
    ema = ref_eu.EfficientUNet(in_channels=2, resolution=(H, W), **TINY).eval()
    with torch.no_grad():
        for p in ema.parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
    # raw weights differ from EMA — the converter must pick ema_weights
    raw = {f"model.{k}": v + 1.0 for k, v in ema.state_dict().items()}
    ckpt = {
        "weights": raw,
        "ema_weights": {f"model.{k}": v for k, v in ema.state_dict().items()},
        "cfg": {"model": {"params": {"attn_num_heads": TINY["attn_num_heads"]}}},
        "global_step": 300000,
    }
    path = tmp_path_factory.mktemp("ckpt") / "nusc-tiny-300000.pth"
    torch.save(ckpt, path)
    return ema, path


OVERRIDES = [
    "model.params.base_channels=16",
    "model.params.channel_multiplier=[1,2,4,8]",
    "model.params.num_residual_blocks=[1,1,1,1]",
    "model.params.gn_num_groups=4",
    "model.params.attn_num_heads=4",
    'model.params.coords_encoding="fourier_features"',
    "data.resolution=[32,64]",
    'data.projection="unfolding-64"',  # bare polar coords, like the torch side
]


def test_convert_checkpoint_cli_end_to_end(ref_ckpt, tmp_path):
    ema, pth = ref_ckpt
    out_dir = tmp_path / "orbax"
    cmd = [
        sys.executable, str(REPO / "tools/convert_checkpoint.py"),
        "--torch-ckpt", str(pth), "-c", "nuscenes-unet-uncond",
        "-o", str(out_dir),
    ]
    for s in OVERRIDES:
        cmd += ["--set", s]
    env = dict(os.environ, LCT_PLATFORM="cpu", PYTHONPATH=str(REPO))
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "init-tree shape check: OK" in r.stdout
    assert out_dir.exists()

    # restore through the template the sampling CLIs build
    sys.path.insert(0, str(REPO / "tools"))
    from convert_checkpoint import apply_override

    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training import TrainState, make_optimizer
    from lidarcrafter_tpu.training.checkpoint import restore_checkpoint
    from lidarcrafter_tpu.training.factory import build_diffusion_training

    cfg = get_config("nuscenes-unet-uncond")
    for s in OVERRIDES:
        apply_override(cfg, s)
    model, _, _ = build_diffusion_training(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 2)),
                      jnp.zeros((1,)))
    template = TrainState.create(init, make_optimizer())
    state, saved_cfg = restore_checkpoint(str(out_dir), template)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 2, H, W).astype(np.float32)
    t = np.array([-3.0, 4.0], np.float32)
    with torch.no_grad():
        want = ema(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    got = model.apply(state.ema_params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(t))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    # EMA weights restored (raw were shifted +1.0, so a mixup fails loudly)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_ingest_dispatch_conditional(monkeypatch, tmp_path):
    """Engine-prefix splitting + config-driven kwargs for conditional stacks
    (the family converters themselves are parity-tested in test_torch_ckpt)."""
    import lidarcrafter_tpu.utils.torch_ckpt as tc
    from lidarcrafter_tpu.configs import get_config

    p = tmp_path / "cond.pth"
    torch.save(
        {"weights": {"model.a": torch.zeros(1),
                     "condition_model.b": torch.ones(1)}},
        p,
    )
    seen = {}
    monkeypatch.setattr(
        tc, "convert_layout_unet",
        lambda sd, **kw: seen.setdefault("m", (dict(sd), kw)) and {"params": {}},
    )
    monkeypatch.setattr(
        tc, "convert_layout_encoder",
        lambda sd: seen.setdefault("c", dict(sd)) and {"params": {}},
    )
    cfg = get_config("nuscenes-auto-reg-v2")
    out = tc.ingest_checkpoint_for_config(cfg, str(p))
    assert set(out) == {"model", "cond"}
    msd, kw = seen["m"]
    assert list(msd) == ["a"]  # engine prefix stripped, cond keys excluded
    assert list(seen["c"]) == ["b"]
    assert kw["channel_mult"] == tuple(cfg.model.params["channel_mult"])
    assert kw["num_res_blocks"] == cfg.model.params["num_res_blocks"]


def test_apply_override_tuple_and_dict(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    from convert_checkpoint import apply_override

    from lidarcrafter_tpu.configs import get_config

    cfg = get_config("nuscenes-unet-uncond")
    apply_override(cfg, "model.params.base_channels=24")
    assert cfg.model.params["base_channels"] == 24
    apply_override(cfg, "data.resolution=[8,16]")
    assert cfg.data.resolution == (8, 16)  # tuple-ness preserved
