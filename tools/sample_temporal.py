#!/usr/bin/env python
"""4D sequence rollout driver; mirrors ``tools/evaluation/sample_and_save_temporal.py``.

Loads the layout-conditioned and autoregressive checkpoints, rolls each scene
1 + N frames with :class:`lidarcrafter_tpu.pipeline.TemporalRollout`, and
saves per-frame point clouds (txt, same layout as the reference's
``temporal_points`` outputs consumed by TTCE/TCD).
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cond-cfg", default="nuscenes-box-layout-v6")
    parser.add_argument("--autoreg-cfg", default="nuscenes-auto-reg-v2")
    parser.add_argument("--cond-ckpt", default=None)
    parser.add_argument("--autoreg-ckpt", default=None)
    parser.add_argument("--scenes", required=True,
                        help="pickle: list of first-frame batches with gt_fut_trajs/boxes")
    parser.add_argument("--num-frames", type=int, default=15)
    parser.add_argument("--num-steps", type=int, default=256)
    parser.add_argument("--mode", choices=["ddpm", "ddim", "dpmpp_2m"],
                        default="ddpm",
                        help="sampler; dpmpp_2m @ 25 steps is the certified "
                             "product fast path (BASELINE.md round 4)")
    parser.add_argument("--interp", type=int, default=16)
    parser.add_argument("--resolution", type=int, nargs=2, default=None,
                        help="override (H, W) for reduced-size smokes; the "
                        "scene batch maps must match this resolution")
    parser.add_argument("--model-channels", type=int, default=None,
                        help="override both branches' UNet model/encoder "
                        "channel width for reduced-size smokes (cf. "
                        "generate_flow --base-channels)")
    parser.add_argument("--stream-chunks", type=int, default=2,
                        help="split the frame scan into N programs so frame "
                        "delivery overlaps the next chunk's compute "
                        "(bit-exact; 1 = single program)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-o", "--output", default="temporal_points")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from lidarcrafter_tpu.configs import apply_reduced_topology, get_config
    from lidarcrafter_tpu.pipeline import TemporalRollout
    from lidarcrafter_tpu.training import TrainState, build_diffusion_training, make_optimizer
    from lidarcrafter_tpu.training.checkpoint import restore_checkpoint
    from lidarcrafter_tpu.training.preprocess import postprocess_sample

    def load_branch(cfg_name, ckpt):
        cfg = apply_reduced_topology(
            get_config(cfg_name),
            resolution=args.resolution,
            model_channels=args.model_channels,
        )
        models, engine, lidar_utils = build_diffusion_training(cfg)
        H, W = cfg.data.resolution
        L = cfg.condition_model.params["layout_length"]
        cond_in = {
            "scaled_gt_boxes": jnp.zeros((1, L, 9)),
            "gt_boxes_2d": jnp.zeros((1, L, 4)),
            "is_valid_obj": jnp.ones((1, L)),
            "concat_cond": jnp.zeros((1, H, W, cfg.condition_model.params["out_channels"] - (1 if "auto" in cfg_name else 0))),
        }
        if "auto" in cfg_name:
            cond_in["autoregressive_cond"] = jnp.zeros((1, H, W, 1))
        cond_params = models["cond"].init(jax.random.PRNGKey(0), cond_in)
        layout = models["cond"].apply(cond_params, cond_in)
        cd = {"time_condition": jnp.zeros((1,)), "other_condition": layout}
        model_params = models["model"].init(
            jax.random.PRNGKey(1), jnp.zeros((1, H, W, 2)), cd
        )
        params = {"model": model_params, "cond": cond_params}
        if ckpt:
            template = TrainState.create(params, make_optimizer())
            state, _ = restore_checkpoint(ckpt, template)
            params = state.ema_params
        return engine, params, lidar_utils

    cond_engine, cond_params, lidar_utils = load_branch(args.cond_cfg, args.cond_ckpt)
    auto_engine, auto_params, _ = load_branch(args.autoreg_cfg, args.autoreg_ckpt)

    pipeline = TemporalRollout(
        cond_engine=cond_engine, cond_params=cond_params,
        autoreg_engine=auto_engine, autoreg_params=auto_params,
        lidar_utils=lidar_utils, num_sampling_steps=args.num_steps,
        sampling_mode=args.mode,
    )

    with open(args.scenes, "rb") as f:
        scenes = pickle.load(f)

    out_root = Path(args.output)
    rng = jax.random.PRNGKey(args.seed)
    for si, scene in enumerate(scenes):
        rng, r = jax.random.split(rng)
        frames = pipeline.rollout(
            scene["batch"], scene["gt_fut_trajs"], scene["boxes0"],
            scene["box_classes"], r, num_frames=args.num_frames,
            interp_M=args.interp, stream_chunks=args.stream_chunks,
        )
        seq_dir = out_root / f"seq_{si:04d}"
        seq_dir.mkdir(parents=True, exist_ok=True)
        for fi, frame in enumerate(frames):
            post = postprocess_sample(jnp.asarray(frame), lidar_utils)
            xyz = np.asarray(post["xyz"][0]).reshape(-1, 3)
            keep = np.linalg.norm(xyz, axis=1) > 1e-2
            np.savetxt(seq_dir / f"frame_{fi:03d}.txt", xyz[keep], fmt="%.6f")
        print(f"scene {si}: wrote {len(frames)} frames to {seq_dir}")


if __name__ == "__main__":
    main()
