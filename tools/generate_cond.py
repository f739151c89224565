#!/usr/bin/env python
"""Conditional single-frame generation (layout-cond / autoregressive);
mirrors ``tools/generate/generate_cond.py``.

Loads a val-split dataset sample, builds the condition streams exactly like
training (semantic-onehot+depth concat cond, normalized prev-frame depth for
autoregressive configs; cf. ``generate_cond.py:53-100``), and samples the
conditional engine.  ``--synthetic`` replaces the dataset sample with zero
conditions for a data-free smoke run.

Usage:
  python tools/generate_cond.py -c nuscenes-auto-reg-v2 --ckpt DIR --sample-idx 0
  python tools/generate_cond.py -c nuscenes-box-layout-v6 --synthetic
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", default="nuscenes-auto-reg-v2")
    parser.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    parser.add_argument("--sample-idx", type=int, default=0)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("-n", "--num-samples", type=int, default=1)
    parser.add_argument("--num-steps", type=int, default=256)
    parser.add_argument("--mode", choices=["ddpm", "ddim", "dpmpp_2m"], default="ddpm")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-o", "--output", default="generated_cond")
    parser.add_argument("--ema", action="store_true")
    parser.add_argument("--resolution", type=int, nargs=2, default=None,
                        help="override H W (smoke runs)")
    args = parser.parse_args()

    import numpy as np

    import os as _os

    import jax

    if _os.environ.get("LCT_PLATFORM"):  # hermetic CLI smokes force cpu
        jax.config.update("jax_platforms", _os.environ["LCT_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training import (
        TrainState,
        build_diffusion_training,
        make_optimizer,
    )
    from lidarcrafter_tpu.training.checkpoint import restore_checkpoint
    from lidarcrafter_tpu.training.preprocess import (
        postprocess_sample,
        preprocess_autoregressive_cond,
        preprocess_condition_mask,
    )

    cfg = get_config(args.cfg)
    if args.resolution:
        cfg.data.resolution = tuple(args.resolution)
        if getattr(cfg, "condition_model", None) is not None:
            cfg.condition_model.params["feature_map_size"] = tuple(args.resolution)
    if getattr(cfg, "condition_model", None) is None:
        raise SystemExit(f"{args.cfg} is not a conditional config — use tools/generate.py")
    models, engine, lidar_utils = build_diffusion_training(cfg)
    model, cond_model = models["model"], models["cond"]

    H, W = cfg.data.resolution
    L = cfg.condition_model.params["layout_length"]
    cc = cfg.condition_model.params.get("out_channels", 0)
    B = args.num_samples
    ncls = len(cfg.data.class_names)

    # ---------------------------------------------------------- conditions
    if args.synthetic:
        batch = {
            "scaled_gt_boxes": jnp.zeros((B, L, 9)),
            "gt_boxes_2d": jnp.zeros((B, L, 4)),
            "is_valid_obj": jnp.ones((B, L)),
        }
        if cc:
            batch["concat_cond"] = jnp.zeros((B, H, W, cc - 1 if "auto" in args.cfg else cc))
            if "auto" in args.cfg:
                batch["autoregressive_cond"] = jnp.zeros((B, H, W, 1))
    else:
        from lidarcrafter_tpu.datasets import __all_datasets__

        cfg.data.split = "val"
        ds = __all_datasets__[cfg.data.dataset](cfg)
        items = [ds[(args.sample_idx + i) % len(ds)] for i in range(B)]
        np_batch = ds.collate_fn(items)
        jb = {k: jnp.asarray(v) for k, v in np_batch.items()
              if isinstance(v, np.ndarray)}
        batch = dict(jb)
        if "condition_mask" in jb:
            batch["concat_cond"] = preprocess_condition_mask(
                jb, lidar_utils, ncls
            )
        if "autoregressive_cond" in jb:
            batch["autoregressive_cond"] = preprocess_autoregressive_cond(
                jb["autoregressive_cond"], lidar_utils, include_reflectance=False
            )

    # -------------------------------------------------------------- params
    rng = jax.random.PRNGKey(args.seed)
    cond_params = cond_model.init(jax.random.PRNGKey(1), batch)
    layout = cond_model.apply(cond_params, batch)
    cd = {"time_condition": jnp.zeros((B,)), "other_condition": layout}
    model_params = model.init(jax.random.PRNGKey(2), jnp.zeros((B, H, W, 2)), cd)
    init_params = {"model": model_params, "cond": cond_params}
    if args.ckpt:
        tx = make_optimizer()
        template = TrainState.create(init_params, tx)
        state, _ = restore_checkpoint(args.ckpt, template)
        params = state.ema_params if args.ema else state.params
    else:
        print("WARNING: no checkpoint — sampling from random init")
        params = init_params

    # ------------------------------------------------------------ sampling
    sample = engine.sample(
        params, rng, batch, batch_size=B, num_steps=args.num_steps,
        mode=args.mode,
    )
    post = postprocess_sample(sample, lidar_utils)
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(B):
        xyz = np.asarray(post["xyz"][i]).reshape(-1, 3)
        keep = np.linalg.norm(xyz, axis=1) > 1e-2
        np.savetxt(out_dir / f"cond_sample_{i:04d}.txt", xyz[keep], fmt="%.6f")
        np.save(out_dir / f"cond_sample_{i:04d}_depth.npy",
                np.asarray(post["depth"][i]))
    print(f"wrote {B} conditional samples -> {out_dir}")


if __name__ == "__main__":
    main()
