#!/usr/bin/env python
"""Eval-scale conditional sample-and-save; mirrors
``tools/evaluation/sample_and_save_cond.py`` (:22-160): walk the dataset in
order, build the condition streams exactly like training, sample the
conditional engine in fixed-size batches, and save each frame as a
reference-format ``.pth`` dump (5, H, W) = [depth, x, y, z, reflectance]
named ``samples_{seed:07d}_{token}.pth`` — scoreable by BOTH this repo's
eval CLIs and the reference's ``evaluate_from_samples.py``.

``--format txt`` writes point-list files instead (this repo's native eval
format).  ``--synthetic N`` replaces the dataset with N zero-condition
batches for a data-free smoke run.

Usage:
  python tools/sample_and_save_cond.py -c nuscenes-auto-reg-v2 --ckpt DIR \
      --num-sample 10000 -b 8 --num-steps 256 --mode ddpm -o generated/our
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", default="nuscenes-auto-reg-v2")
    parser.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    parser.add_argument("-b", "--batch-size", type=int, default=8)
    parser.add_argument("--num-sample", type=int, default=10000)
    parser.add_argument("--num-steps", type=int, default=256)
    parser.add_argument("--mode", choices=["ddpm", "ddim", "dpmpp_2m"],
                        default="ddpm")
    parser.add_argument("--split", default="all",
                        help="dataset split (reference uses 'all', :51)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ema", action="store_true")
    parser.add_argument("--format", choices=["pth", "txt"], default="pth")
    parser.add_argument("--synthetic", type=int, default=0, metavar="N")
    parser.add_argument("--resolution", type=int, nargs=2, default=None,
                        help="override H W (smoke runs)")
    parser.add_argument("-o", "--output", default="generated_results/our")
    args = parser.parse_args()

    import os as _os

    import numpy as np
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
        layout_condition_batch,
        make_optimizer,
    )
    from lidarcrafter_tpu.training.checkpoint import restore_checkpoint
    from lidarcrafter_tpu.training.preprocess import (
        postprocess_sample,
        preprocess_autoregressive_cond,
        preprocess_condition_mask,
    )
    from lidarcrafter_tpu.utils.sample_io import save_pth_sample

    cfg = get_config(args.cfg)
    if args.resolution:
        cfg.data.resolution = tuple(args.resolution)
        if getattr(cfg, "condition_model", None) is not None:
            cfg.condition_model.params["feature_map_size"] = tuple(args.resolution)
    if getattr(cfg, "condition_model", None) is None:
        raise SystemExit(f"{args.cfg} is not a conditional config")
    models, engine, lidar_utils = build_diffusion_training(cfg)
    model, cond_model = models["model"], models["cond"]

    H, W = cfg.data.resolution
    ncls = len(cfg.data.class_names)
    B = args.batch_size

    def zero_batch():
        return layout_condition_batch(cfg, B)

    # ------------------------------------------------------------ dataset
    if args.synthetic:
        n_total = args.synthetic

        def batches():
            for start in range(0, n_total, B):
                toks = [f"synthetic{start + i}" for i in range(B)]
                yield zero_batch(), toks
    else:
        from lidarcrafter_tpu.datasets import __all_datasets__

        cfg.data.split = args.split
        ds = __all_datasets__[cfg.data.dataset](cfg)
        n_total = min(args.num_sample, len(ds))

        def batches():
            # fixed-size batches (static jit shape); the tail wraps like the
            # reference's drop_last=False + fixed sample seeds
            for start in range(0, n_total, B):
                idx = [min(start + i, len(ds) - 1) for i in range(B)]
                items = [ds[j] for j in idx]
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
                        jb["autoregressive_cond"], lidar_utils,
                        include_reflectance=False,
                    )
                toks = np_batch.get(
                    "token", [f"idx{j:06d}" for j in idx]
                )
                yield batch, list(toks)

    # ------------------------------------------------------------- params
    b0 = zero_batch()
    cond_params = cond_model.init(jax.random.PRNGKey(1), b0)
    layout = jax.eval_shape(cond_model.apply, cond_params, b0)
    cd = {
        "time_condition": jnp.zeros((B,)),
        "other_condition": jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), layout
        ),
    }
    model_params = model.init(jax.random.PRNGKey(2), jnp.zeros((B, H, W, 2)), cd)
    init_params = {"model": model_params, "cond": cond_params}
    if args.ckpt:
        tx = make_optimizer()
        template = TrainState.create(init_params, tx)
        state, _ = restore_checkpoint(args.ckpt, template)
        params = state.ema_params if args.ema else state.params
    else:
        print("WARNING: no checkpoint — sampling from random init",
              file=sys.stderr)
        params = init_params

    # ----------------------------------------------------------- sampling
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    written = 0
    for step, (batch, toks) in enumerate(batches()):
        sample = engine.sample(
            params, jax.random.fold_in(rng, step), batch, batch_size=B,
            num_steps=args.num_steps, mode=args.mode,
        )
        post = postprocess_sample(jnp.clip(sample, -1, 1), lidar_utils)
        depth = np.asarray(post["depth"])
        xyz = np.asarray(post["xyz"])
        refl = np.asarray(post["reflectance"]) if "reflectance" in post else None
        for i in range(B):
            if written >= n_total:
                break
            seed_id = step * B + i  # cf. sample_and_save_cond.py:133-135
            if args.format == "pth":
                save_pth_sample(
                    out_dir / f"samples_{seed_id:07d}_{toks[i]}.pth",
                    depth[i], xyz[i],
                    refl[i] if refl is not None else None,
                )
            else:
                pts = xyz[i].reshape(-1, 3)
                keep = np.linalg.norm(pts, axis=1) > 1e-2
                np.savetxt(
                    out_dir / f"samples_{seed_id:07d}_{toks[i]}.txt",
                    pts[keep], fmt="%.6f",
                )
            written += 1
        print(f"saved {written}/{n_total}", file=sys.stderr, flush=True)
        if written >= n_total:
            break
    print(f"wrote {written} samples -> {out_dir}")


if __name__ == "__main__":
    main()
