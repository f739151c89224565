#!/usr/bin/env python
"""Export a sampler as a self-contained AOT serving artifact.

The full sampler program (conditioning encoder + N-step DDIM/DDPM scan +
range→point postprocess, params baked in) is lowered and serialized via
``jax.export``; a serving host loads it with
``lidarcrafter_tpu.serving.load_artifact`` and calls it with RNG keys (and a
per-request condition for conditional configs).  No reference analogue —
the reference serves by loading torch modules (``tools/generate/generate.py``).

Usage:
  python tools/export.py -c nuscenes-unet-uncond --ckpt CKPT -o art/ \
      --batch 8 --num-steps 50 --mode ddim [--platform tpu,cpu]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", default="nuscenes-unet-uncond")
    parser.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    parser.add_argument("-o", "--output", default="exported_sampler")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--num-steps", type=int, default=50)
    parser.add_argument("--mode", choices=["ddpm", "ddim", "dpmpp_2m"], default="ddim")
    parser.add_argument("--ema", action="store_true")
    parser.add_argument(
        "--platform", default=None,
        help="comma-separated lowering platforms (default: current backend)",
    )
    parser.add_argument(
        "--dtype", choices=["bfloat16", "float32"], default="bfloat16"
    )
    parser.add_argument(
        "--raw", action="store_true",
        help="emit the raw [-1,1] sample instead of depth/xyz/reflectance",
    )
    parser.add_argument(
        "--resolution", type=int, nargs=2, default=None,
        help="override H W (smokes/debug; checkpoints need the native res)",
    )
    args = parser.parse_args()

    import os as _os

    import jax

    if _os.environ.get("LCT_PLATFORM"):  # hermetic CLI smokes force cpu
        jax.config.update("jax_platforms", _os.environ["LCT_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.serving import export_sampler, save_artifact
    from lidarcrafter_tpu.training import (
        TrainState,
        build_diffusion_training,
        make_optimizer,
    )
    from lidarcrafter_tpu.training.checkpoint import restore_checkpoint

    cfg = get_config(args.cfg)
    if args.resolution:
        cfg.data.resolution = tuple(args.resolution)
        if getattr(cfg, "condition_model", None) is not None:
            cfg.condition_model.params["feature_map_size"] = tuple(
                args.resolution
            )
    models, engine, _ = build_diffusion_training(cfg)
    conditional = getattr(engine, "cond_apply_fn", None) is not None
    H, W = cfg.data.resolution
    B = args.batch

    # ------------------------------------------------- init params + example
    condition_example = None
    if conditional:
        model, cond_model = models["model"], models["cond"]
        L = cfg.condition_model.params["layout_length"]
        cc = cfg.condition_model.params.get("out_channels", 0)
        condition_example = {
            "scaled_gt_boxes": jnp.zeros((B, L, 9)),
            "gt_boxes_2d": jnp.zeros((B, L, 4)),
            "is_valid_obj": jnp.ones((B, L)),
        }
        if cc:
            auto = "auto" in args.cfg
            condition_example["concat_cond"] = jnp.zeros(
                (B, H, W, cc - 1 if auto else cc)
            )
            if auto:
                condition_example["autoregressive_cond"] = jnp.zeros((B, H, W, 1))
        cond_params = cond_model.init(jax.random.PRNGKey(1), condition_example)
        layout = cond_model.apply(cond_params, condition_example)
        cd = {"time_condition": jnp.zeros((B,)), "other_condition": layout}
        model_params = model.init(
            jax.random.PRNGKey(2), jnp.zeros((B, H, W, 2)), cd
        )
        init_params = {"model": model_params, "cond": cond_params}
    else:
        init_params = models.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 2)), jnp.zeros((1,))
        )

    if args.ckpt:
        tx = make_optimizer()
        template = TrainState.create(init_params, tx)
        state, _ = restore_checkpoint(args.ckpt, template)
        params = state.ema_params if args.ema else state.params
    else:
        print("WARNING: no checkpoint — exporting random-init weights")
        params = init_params

    # ---------------------------------------------------------------- export
    exported = export_sampler(
        cfg,
        params,
        batch_size=B,
        num_steps=args.num_steps,
        mode=args.mode,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
        with_postprocess=not args.raw,
        condition_example=condition_example,
        platforms=tuple(args.platform.split(",")) if args.platform else None,
    )
    out = save_artifact(
        args.output, exported,
        meta={
            "config": args.cfg,
            "batch_size": B,
            "num_steps": args.num_steps,
            "mode": args.mode,
            "dtype": args.dtype,
            "conditional": conditional,
            "postprocess": not args.raw,
            "ckpt": args.ckpt or "",
            "ema": bool(args.ema),
        },
    )
    size = (out / "sampler.stablehlo").stat().st_size
    print(f"exported {args.cfg} -> {out} ({size / 1e6:.1f} MB, "
          f"platforms={list(exported.platforms)})")


if __name__ == "__main__":
    main()
