#!/usr/bin/env python
"""Generate 4D layouts (boxes + trajectories) from scene graphs; mirrors
``tools/generate/generate_layout.py``.

Consumes collated scene-graph batches (see
``lidarcrafter_tpu.datasets.scene_graph.collate_scene_graphs``) and samples
(N, 20) box+trajectory vectors with the 1D layout diffusion engine.
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", default="nuscenes-layout")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--graphs", required=True, help="pickled collated scene-graph batch")
    parser.add_argument("--num-steps", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-o", "--output", default="generated_layouts.pkl")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.datasets.transforms import unscale_boxes_3d
    from lidarcrafter_tpu.training.factory import build_layout_training

    cfg = get_config(args.cfg)
    models, engine, _ = build_layout_training(cfg)

    with open(args.graphs, "rb") as f:
        batch = pickle.load(f)
    dec = batch["decoder"]
    sg = {
        "objs": jnp.asarray(dec["objs"]),
        "triples": jnp.asarray(dec["tripltes"]),
        "text_feats": jnp.asarray(dec["text_feats"]),
        "rel_feats": jnp.asarray(dec["rel_feats"]),
    }
    input_dict = {
        "boxes": jnp.asarray(dec["boxes"]),
        "scene_ids": jnp.asarray(dec["obj_to_scene"]),
        "scenegraph": sg,
    }

    rng = jax.random.PRNGKey(args.seed)
    cond_params = models["cond"].init(
        rng, sg["objs"], sg["triples"], sg["text_feats"], sg["rel_feats"]
    )
    latent, obj_embed = models["cond"].apply(
        cond_params, sg["objs"], sg["triples"], sg["text_feats"], sg["rel_feats"]
    )
    cd = {
        "time_condition": jnp.zeros((len(dec["objs"]),)),
        "other_condition": {"preds": sg["triples"], "uc_b": obj_embed},
    }
    model_params = models["model"].init(
        jax.random.PRNGKey(1), input_dict["boxes"][:, :20], cd
    )
    params = {"model": model_params, "cond": cond_params}
    if args.ckpt:
        from lidarcrafter_tpu.training import TrainState, make_optimizer
        from lidarcrafter_tpu.training.checkpoint import restore_checkpoint

        template = TrainState.create(params, make_optimizer())
        state, _ = restore_checkpoint(args.ckpt, template)
        params = state.ema_params

    out = engine.sample(params, rng, input_dict, num_steps=args.num_steps)
    boxes, trajs = unscale_boxes_3d(np.asarray(out))
    with open(args.output, "wb") as f:
        pickle.dump({"boxes": boxes, "trajs": trajs, "raw": np.asarray(out)}, f)
    print(f"wrote {len(boxes)} layout nodes to {args.output}")


if __name__ == "__main__":
    main()
