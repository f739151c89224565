#!/usr/bin/env python
"""Generate per-object foreground point clouds; mirrors
``tools/generate/generate_object.py``: box+class conditioned point diffusion.
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", default="nuscenes-object")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--boxes", required=True,
                        help="pickle with {'fg_encoding_box', 'fg_class', 'fg_text_features'}")
    parser.add_argument("--num-steps", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-o", "--output", default="generated_objects.pkl")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training.factory import build_object_training

    cfg = get_config(args.cfg)
    models, engine, _ = build_object_training(cfg)

    with open(args.boxes, "rb") as f:
        cond = pickle.load(f)
    input_dict = {k: jnp.asarray(v) for k, v in cond.items()}
    B = input_dict["fg_class"].shape[0]

    rng = jax.random.PRNGKey(args.seed)
    cond_params = models["cond"].init(jax.random.PRNGKey(0), input_dict)
    feat = models["cond"].apply(cond_params, input_dict)
    cd = {"time_condition": jnp.zeros((B,)), "other_condition": feat}
    model_params = models["model"].init(
        jax.random.PRNGKey(1),
        jnp.zeros((B, cfg.data.num_samples, cfg.model.params["point_dim"])),
        cd,
    )
    params = {"model": model_params, "cond": cond_params}
    if args.ckpt:
        from lidarcrafter_tpu.training import TrainState, make_optimizer
        from lidarcrafter_tpu.training.checkpoint import restore_checkpoint

        template = TrainState.create(params, make_optimizer())
        state, _ = restore_checkpoint(args.ckpt, template)
        params = state.ema_params

    out = engine.sample(
        params, rng, input_dict, batch_size=B, num_steps=args.num_steps
    )
    with open(args.output, "wb") as f:
        pickle.dump(np.asarray(out), f)
    print(f"wrote {B} object clouds to {args.output}")


if __name__ == "__main__":
    main()
