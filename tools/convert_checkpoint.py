#!/usr/bin/env python
"""Convert a reference ``.pth`` checkpoint into an orbax checkpoint dir that
this repo's sampling/eval CLIs load with ``--ckpt`` — the one-command
migration path for released reference weights (HF model zoo,
``/root/reference README.md:62``; loader contract ``inference.py:28-117``).

Covers every model family in the config registry: EfficientUNet (uncond +
MeanFlow), HDiT, LayoutUnetV1/v0 + LayoutTransformerEncoder (auto-reg /
box-layout), UNet1D + SceneGraph (layout), PointUNet + ObjectGenEncoder
(object).  EMA weights are preferred when present (like the reference's
``inference.py:75``); both params and ema_params of the saved TrainState get
the converted weights, so ``--ema`` and non-``--ema`` sampling both work.

Usage:
  python tools/convert_checkpoint.py --torch-ckpt nusc-unet-uncond-300000.pth \
      -c nuscenes-unet-uncond -o ckpts/uncond
  python tools/generate.py -c nuscenes-unet-uncond --ckpt ckpts/uncond --ema

``--set path=json`` overrides config fields before conversion (e.g.
``--set model.params.base_channels=16``) for checkpoints trained off-registry.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def apply_override(cfg, spec: str):
    """``a.b.c=json`` → set attribute/dict entry on the config, keeping
    tuple-ness of the field being replaced."""
    path, _, raw = spec.partition("=")
    value = json.loads(raw)
    parts = path.split(".")
    obj = cfg
    for p in parts[:-1]:
        obj = obj[p] if isinstance(obj, dict) else getattr(obj, p)
    leaf = parts[-1]
    old = obj[leaf] if isinstance(obj, dict) else getattr(obj, leaf, None)
    if isinstance(old, tuple) and isinstance(value, list):
        value = tuple(value)
    if isinstance(obj, dict):
        obj[leaf] = value
    else:
        setattr(obj, leaf, value)


def _shape_template(cfg):
    """Init-tree SHAPES (via ``jax.eval_shape`` — no compute) for the
    families whose synthetic init inputs are cheap to build; None when the
    family is validated at restore time instead."""
    import jax
    import jax.numpy as jnp

    arch = cfg.model.architecture
    H, W = cfg.data.resolution
    key = jax.random.PRNGKey(0)
    if arch in ("efficient_unet", "hdit"):
        from lidarcrafter_tpu.training.factory import build_diffusion_training

        model, _, _ = build_diffusion_training(cfg)
        return jax.eval_shape(
            model.init, key, jnp.zeros((1, H, W, 2)), jnp.zeros((1,))
        )
    if arch == "mf_efficient_unet":
        from lidarcrafter_tpu.training.factory import build_flow_training

        model = build_flow_training(cfg)[0]
        z = jnp.zeros((1, H, W, 2))
        t = jnp.zeros((1,))
        return jax.eval_shape(model.init, key, z, t, t)
    if arch in ("layout_unet", "layout_unet_v1"):
        from lidarcrafter_tpu.training.factory import (
            build_diffusion_training,
            layout_condition_batch,
        )

        models, _, _ = build_diffusion_training(cfg)
        batch = layout_condition_batch(cfg, 1)
        cond_t = jax.eval_shape(models["cond"].init, key, batch)
        layout_t = jax.eval_shape(models["cond"].apply, cond_t, batch)
        cd = {
            "time_condition": jnp.zeros((1,)),
            "other_condition": layout_t,
        }
        x = jnp.zeros((1, H, W, 2))
        model_t = jax.eval_shape(models["model"].init, key, x, cd)
        return {"model": model_t, "cond": cond_t}
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch-ckpt", required=True,
                        help="reference .pth (weights/ema_weights/cfg dict)")
    parser.add_argument("-c", "--cfg", required=True,
                        help="registry config name the checkpoint was trained with")
    parser.add_argument("-o", "--output", required=True,
                        help="orbax checkpoint dir to write")
    parser.add_argument("--no-ema", action="store_true",
                        help="ingest raw weights even when ema_weights exist")
    parser.add_argument("--set", action="append", default=[], metavar="K=V",
                        help="config override, e.g. model.params.base_channels=16")
    parser.add_argument("--no-validate", action="store_true",
                        help="skip the init-tree shape check")
    args = parser.parse_args()

    import os as _os

    import jax

    if _os.environ.get("LCT_PLATFORM"):  # hermetic CLI smokes force cpu
        jax.config.update("jax_platforms", _os.environ["LCT_PLATFORM"])

    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training import TrainState, make_optimizer
    from lidarcrafter_tpu.training.checkpoint import save_checkpoint
    from lidarcrafter_tpu.utils.torch_ckpt import ingest_checkpoint_for_config

    cfg = get_config(args.cfg)
    for spec in args.set:
        apply_override(cfg, spec)

    params = ingest_checkpoint_for_config(
        cfg, args.torch_ckpt, use_ema=not args.no_ema
    )

    if not args.no_validate:
        template = _shape_template(cfg)
        if template is None:
            print(f"note: no shape template for {cfg.model.architecture}; "
                  "mismatches surface at --ckpt restore time instead")
        else:
            import chex

            chex.assert_trees_all_equal_shapes(params, template)
            print("init-tree shape check: OK")

    # TrainState.create copies params into ema_params, so both --ema and
    # non---ema sampling load the converted weights
    state = TrainState.create(params, make_optimizer())
    save_checkpoint(str(Path(args.output).resolve()), state, cfg=cfg)
    print(f"wrote orbax checkpoint -> {args.output}")


if __name__ == "__main__":
    main()
