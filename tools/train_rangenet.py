#!/usr/bin/env python
"""Train RangeNet on nuScenes lidarseg range images; mirrors
``tools/train/train_nusc_rangenet_sementic.py`` (SGD + warmup/exp-decay LR,
inverse-frequency class weights with void zeroed, mIoU eval).

Usage:
  python tools/train_rangenet.py --info data/infos/nuscenes_infos_10sweeps_train.pkl \
      --data-root data/nuscenes [--backbone 21|53] [--num-steps N]
  python tools/train_rangenet.py --synthetic-data --num-steps 20   # smoke run
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synthetic_batches(B, H, W, num_classes, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    while True:
        img = rng.rand(B, H, W, 5).astype(np.float32)
        labels = rng.randint(0, num_classes, (B, H, W)).astype(np.int32)
        yield img, labels


def real_batches(info, data_root, B, H, W):
    import numpy as np

    from lidarcrafter_tpu.datasets.seg_dataset import NuscSegDataset

    ds = NuscSegDataset(info, data_root, resolution=(H, W))
    order = np.random.permutation(len(ds))
    while True:
        for i in range(0, len(order) - B + 1, B):
            batch = ds.collate_fn([ds[j] for j in order[i : i + B]])
            yield ds.rangenet_input(batch), batch["segment"]
        order = np.random.permutation(len(ds))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--info", default=None)
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--backbone", type=int, default=53, choices=[21, 53])
    p.add_argument("-b", "--batch-size", type=int, default=8)
    p.add_argument("--num-steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--w-decay", type=float, default=1e-4)
    p.add_argument("--warmup-steps", type=int, default=1000)
    p.add_argument("--lr-decay", type=float, default=0.9995)
    p.add_argument("--resolution", type=int, nargs=2, default=(32, 1024))
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--output-dir", default="runs/rangenet")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lidarcrafter_tpu.datasets.seg_dataset import NUM_SEG_CLASSES
    from lidarcrafter_tpu.metrics.extractor.rangenet import RangeNet
    from lidarcrafter_tpu.training.checkpoint import save_checkpoint
    from lidarcrafter_tpu.training.segmentation import (
        make_rangenet_optimizer,
        make_segmentation_train_step,
        mean_iou,
        rangenet_class_weights,
    )

    H, W = args.resolution
    model = RangeNet(num_classes=NUM_SEG_CLASSES, backbone=args.backbone)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 5)))
    tx = make_rangenet_optimizer(
        lr=args.lr, momentum=args.momentum, weight_decay=args.w_decay,
        warmup_steps=args.warmup_steps, decay=args.lr_decay,
    )
    opt_state = tx.init(params)
    step_fn = make_segmentation_train_step(
        lambda prm, img: model.apply(prm, img),
        tx,
        class_weights=rangenet_class_weights(NUM_SEG_CLASSES),
        ignore_index=0,  # void (empty pixels / unlabeled) carries weight 0
    )
    if args.synthetic_data:
        data = synthetic_batches(args.batch_size, H, W, NUM_SEG_CLASSES)
    else:
        data = real_batches(args.info, args.data_root, args.batch_size, H, W)

    miou_fn = jax.jit(
        lambda prm, img, lbl: mean_iou(
            model.apply(prm, img), lbl, NUM_SEG_CLASSES, ignore_index=0
        )
    )
    for step in range(1, args.num_steps + 1):
        img, labels = next(data)
        params, opt_state, loss = step_fn(
            params, opt_state, {"image": jnp.asarray(img), "labels": jnp.asarray(labels)}
        )
        if step % 50 == 0 or step <= 2:
            print({"step": step, "loss": float(loss)})
        if step % args.eval_every == 0:
            img, labels = next(data)
            print({"step": step, "miou": float(miou_fn(params, jnp.asarray(img), jnp.asarray(labels)))})
    save_checkpoint(
        str(Path(args.output_dir) / f"ckpt_{args.num_steps:010d}"),
        {"params": params}, None,
    )
    print("done")


if __name__ == "__main__":
    main()
