#!/usr/bin/env python
"""One-step MeanFlow generation; mirrors ``tools/generate/generate_flow.py``.

Usage: python tools/generate_flow.py -c meanflow-nusc --ckpt DIR -n 8 -o out/
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", default="meanflow-nusc")
    parser.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    parser.add_argument("-n", "--num-samples", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-o", "--output", default="generated_flow")
    parser.add_argument("--ema", action="store_true")
    parser.add_argument("--resolution", type=int, nargs=2, default=None,
                        help="override H W (smoke runs)")
    parser.add_argument("--base-channels", type=int, default=None,
                        help="override model width (smoke runs; incompatible "
                             "with --ckpt)")
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
    from lidarcrafter_tpu.training import TrainState, make_optimizer
    from lidarcrafter_tpu.training.checkpoint import restore_checkpoint
    from lidarcrafter_tpu.training.factory import build_flow_training
    from lidarcrafter_tpu.training.preprocess import postprocess_sample

    cfg = get_config(args.cfg)
    if args.resolution:
        cfg.data.resolution = tuple(args.resolution)
    if args.base_channels:
        if args.ckpt:
            raise SystemExit("--base-channels would mismatch --ckpt weights")
        cfg.model.params["base_channels"] = args.base_channels
    if getattr(cfg, "flow", None) is None:
        raise SystemExit(f"{args.cfg} is not a flow config")
    model, engine, lidar_utils = build_flow_training(cfg)

    H, W = cfg.data.resolution
    rng = jax.random.PRNGKey(args.seed)
    init_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 2)),
        jnp.zeros((1,)), jnp.zeros((1,)),
    )
    if args.ckpt:
        tx = make_optimizer()
        template = TrainState.create(init_params, tx)
        state, _ = restore_checkpoint(args.ckpt, template)
        params = state.ema_params if args.ema else state.params
    else:
        print("WARNING: no checkpoint — sampling from random init")
        params = init_params

    # one-step sample, clamped like the reference (generate_flow.py:33)
    sample = jnp.clip(
        engine.sample(params, rng, batch_size=args.num_samples), -1.0, 1.0
    )
    post = postprocess_sample(sample, lidar_utils)
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(args.num_samples):
        xyz = np.asarray(post["xyz"][i]).reshape(-1, 3)
        keep = np.linalg.norm(xyz, axis=1) > 1e-2
        np.savetxt(out_dir / f"flow_sample_{i:04d}.txt", xyz[keep], fmt="%.6f")
        np.save(out_dir / f"flow_sample_{i:04d}_depth.npy",
                np.asarray(post["depth"][i]))
    print(f"wrote {args.num_samples} flow samples -> {out_dir}")


if __name__ == "__main__":
    main()
