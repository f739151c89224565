#!/usr/bin/env python
"""Generate per-scene box-condition range features (data pipeline step 5);
mirrors ``tools/data_converter/generate_box_condition.py`` (BoxConditionGenerator):
sample per-object point clouds from the trained object diffusion model,
place them at their scene boxes, project to a range image with a semantic
channel, and save the normalized condition tensor per sample.

Usage:
  python tools/generate_box_condition.py --ckpt runs/object/ckpt_... \
      [--split train] [--num-steps 1024] [-o data/box_condition]
  python tools/generate_box_condition.py --random-params --synthetic-scenes 2 \
      -o /tmp/box_cond   # pipeline smoke run without data or a checkpoint
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synthetic_scene(rng, num_boxes=3):
    """Fabricated scene boxes (x y z l w h yaw cls) for smoke runs."""
    boxes = np.zeros((num_boxes, 8), np.float32)
    boxes[:, :2] = rng.uniform(-20, 20, (num_boxes, 2))
    boxes[:, 2] = rng.uniform(-1, 0.5, num_boxes)
    boxes[:, 3:6] = rng.uniform(1.5, 4.5, (num_boxes, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, num_boxes)
    boxes[:, 7] = rng.randint(1, 4, num_boxes)  # 1-based (0 = ego)
    return boxes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="nuscenes-object")
    p.add_argument("--layout-cfg", default="nuscenes-box-layout")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--random-params", action="store_true",
                   help="skip the checkpoint (smoke runs)")
    p.add_argument("--split", default="train")
    p.add_argument("--num-steps", type=int, default=1024)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--synthetic-scenes", type=int, default=0)
    p.add_argument("--text-features", default=None)
    p.add_argument("-o", "--output-dir", default="data/box_condition")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.datasets import transforms as T
    from lidarcrafter_tpu.ops.projection import points_to_range_image
    from lidarcrafter_tpu.training.factory import build_object_training
    from lidarcrafter_tpu.training.loop import ObjectTrainer

    cfg = get_config(args.cfg)
    data_cfg = get_config(args.layout_cfg).data
    models, engine, _ = build_object_training(cfg)
    lidar_cfg = data_cfg

    from lidarcrafter_tpu.utils.lidar import LiDARUtility, get_linear_ray_angles_np

    lidar_utils = LiDARUtility.create(
        tuple(lidar_cfg.resolution), lidar_cfg.depth_format,
        lidar_cfg.min_depth, lidar_cfg.max_depth,
        ray_angles=get_linear_ray_angles_np(
            *lidar_cfg.resolution, fov_up=lidar_cfg.fov_up,
            fov_down=lidar_cfg.fov_down,
        ),
    )

    import pickle

    text = (
        pickle.load(open(args.text_features, "rb"))
        if args.text_features
        else np.zeros((len(cfg.data.class_names), 512), np.float32)
    )
    trainer = ObjectTrainer(cfg, iter(()), text)
    if args.random_params:
        state = trainer.init_state(jax.random.PRNGKey(0))
        params = state.params
    else:
        from lidarcrafter_tpu.training.checkpoint import restore_checkpoint

        template = trainer.init_state(jax.random.PRNGKey(0))
        state, _ = restore_checkpoint(args.ckpt, template)
        params = state.ema_params or state.params

    if args.synthetic_scenes:
        rng_np = np.random.RandomState(0)
        scenes = [synthetic_scene(rng_np) for _ in range(args.synthetic_scenes)]
    else:
        from lidarcrafter_tpu.datasets import __all_datasets__

        data_cfg.split = args.split
        data_cfg.task = "layout_generation"

        class _Wrap:  # NuscDataset expects cfg.data
            data = data_cfg

        ds = __all_datasets__[data_cfg.dataset](_Wrap)
        n = len(ds) if args.limit is None else min(args.limit, len(ds))
        scenes = [ds[i]["gt_boxes"][1:] for i in range(n)]

    out = Path(args.output_dir) / args.split
    out.mkdir(parents=True, exist_ok=True)
    H, W = lidar_cfg.resolution

    @jax.jit
    def make_condition(img):
        """(H, W, 7) [x y z i sem depth valid] → (C, H, W) condition;
        cf. ``generate_box_condition.py:67-87`` preprocess_range_feature."""
        img = img * img[..., 6:7]
        x = []
        if cfg.data.train_depth:
            x.append(lidar_utils.convert_depth(img[..., 5:6]))
        if cfg.data.train_reflectance:
            x.append(img[..., 3:4] / 255.0)
        x = lidar_utils.normalize(jnp.concatenate(x, axis=-1))
        x = jnp.concatenate([x, img[..., 4:5]], axis=-1)
        return jnp.transpose(x, (2, 0, 1))

    for idx, fg_boxes in enumerate(scenes):
        B = len(fg_boxes)
        if B == 0:
            continue
        enc = np.stack(
            [T.encoding_boxes_3d(b[:7], unique_mode=True) for b in fg_boxes]
        ).astype(np.float32)
        batch_dict = {
            "fg_encoding_box": jnp.asarray(enc),
            "fg_class": jnp.asarray(fg_boxes[:, 7].astype(np.int32) - 1),
            "fg_text_features": jnp.asarray(text),
        }
        pts = np.asarray(
            engine.sample(
                params, jax.random.PRNGKey(idx), batch_dict,
                batch_size=B, num_steps=args.num_steps, mode="ddpm",
            )
        )
        placed = [
            np.hstack(
                [
                    T.unnorm_fg_points(pts[i], fg_boxes[i][:7]),
                    np.full((pts.shape[1], 1), fg_boxes[i][7], np.float32),
                ]
            )
            for i in range(B)
        ]
        cloud = np.concatenate(placed, axis=0).astype(np.float32)
        img = points_to_range_image(
            jnp.asarray(cloud), H=H, W=W,
            min_depth=lidar_cfg.min_depth, max_depth=lidar_cfg.max_depth,
            fov_up=lidar_cfg.fov_up, fov_down=lidar_cfg.fov_down,
        )
        cond = np.asarray(make_condition(img))
        np.save(out / f"sample_{idx:07d}.npy", cond)
        print(f"[{idx + 1}/{len(scenes)}] saved {cond.shape}")
    print("done")


if __name__ == "__main__":
    main()
