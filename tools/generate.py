#!/usr/bin/env python
"""Generate single frames from a trained model; mirrors ``tools/generate/generate.py``.

Usage: python tools/generate.py -c nuscenes-unet-uncond --ckpt PATH -n 8 -o out/
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", default="nuscenes-unet-uncond")
    parser.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    parser.add_argument("-n", "--num-samples", type=int, default=8)
    parser.add_argument("--num-steps", type=int, default=256)
    parser.add_argument("--mode", choices=["ddpm", "ddim", "dpmpp_2m"], default="ddpm")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-o", "--output", default="generated")
    parser.add_argument("--ema", action="store_true", help="sample with EMA weights")
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
    from lidarcrafter_tpu.training import TrainState, build_diffusion_training, make_optimizer
    from lidarcrafter_tpu.training.checkpoint import restore_checkpoint
    from lidarcrafter_tpu.training.preprocess import postprocess_sample

    cfg = get_config(args.cfg)
    model, engine, lidar_utils = build_diffusion_training(cfg)

    H, W = cfg.data.resolution
    rng = jax.random.PRNGKey(args.seed)
    init_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 2)), jnp.zeros((1,))
    )
    if args.ckpt:
        tx = make_optimizer()
        template = TrainState.create(init_params, tx)
        state, _ = restore_checkpoint(args.ckpt, template)
        params = state.ema_params if args.ema else state.params
    else:
        print("WARNING: no checkpoint — sampling from random init")
        params = init_params

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    sample = engine.sample(
        params, rng, batch_size=args.num_samples, num_steps=args.num_steps,
        mode=args.mode,
    )
    post = postprocess_sample(sample, lidar_utils)
    for i in range(args.num_samples):
        xyz = np.asarray(post["xyz"][i]).reshape(-1, 3)
        refl = np.asarray(post["reflectance"][i]).reshape(-1, 1)
        pts = np.concatenate([xyz, refl], axis=1)
        pts = pts[np.linalg.norm(xyz, axis=1) > 1e-2]
        np.savetxt(out_dir / f"sample_{i:04d}.txt", pts, fmt="%.6f")
    np.save(out_dir / "samples.npy", np.asarray(sample))
    print(f"wrote {args.num_samples} samples to {out_dir}")


if __name__ == "__main__":
    main()
