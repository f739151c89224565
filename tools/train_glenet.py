#!/usr/bin/env python
"""Train GLENet uncertainty folds for RGF; mirrors
``tools/train/train_uncertainty_glenet.py`` (:100-225) + exp20.yaml: per
KFold(10, shuffle, seed 42) fold, train the CVAE (reg + annealed KL + L2
regularisation, AdamW one-cycle lr 0.003, grad clip 10, batch 64) on the
['car','truck','bus'] object crops and save a fold checkpoint that
``tools/evaluate_our.py --glenet-fold-dir`` consumes for the 30-pass MC eval.

Usage:
  python tools/train_glenet.py --fg-info .../foreground_samples_info.pkl \
      --text-feat data/clips/nuscenes/obj_text_feat.pkl \
      --epochs 400 -o logs/glenet_folds
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def linear_annealing(init, fin, step, annealing_steps):
    """cf. ``train_utils/train_utils.py:9-16``."""
    if annealing_steps == 0:
        return fin
    delta = fin - init
    return min(init + delta * step / annealing_steps, fin)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fg-info", default=None,
                   help="foreground_samples_info.pkl (class→records dict) or "
                        "nuscenes_object_classification pkl (flat list)")
    p.add_argument("--text-feat", default=None,
                   help="obj_text_feat.pkl {class: (1,512)}")
    p.add_argument("--folds", default=None,
                   help="comma list of fold indices (default: all 10)")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="cap steps per epoch (tests)")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.003)
    p.add_argument("--point-dims", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic-data", type=int, default=0, metavar="N",
                   help="use N synthetic crops instead of --fg-info (smoke)")
    p.add_argument("-o", "--output", default="logs/glenet_folds")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from lidarcrafter_tpu.datasets.object_uncertainty import (
        CLASS_NAMES,
        ObjectUncertaintyDataset,
        flatten_uncertainty_infos,
    )
    from lidarcrafter_tpu.metrics.models.glenet import (
        EXP20_KWARGS,
        GLENet,
        make_glenet_optimizer,
        make_glenet_train_step,
    )

    rng = np.random.RandomState(args.seed)
    if args.synthetic_data:
        infos = [
            {
                "name": CLASS_NAMES[i % len(CLASS_NAMES)],
                "num_points_in_gt": int(rng.randint(30, 600)),
                "box3d_lidar": np.array(
                    [*rng.randn(3), 4.0, 1.8, 1.6, rng.uniform(-3, 3)],
                    np.float32,
                ),
                "points": rng.randn(64, 4).astype(np.float32),
            }
            for i in range(args.synthetic_data)
        ]
        text_feat = {c: rng.randn(1, 512).astype(np.float32) for c in CLASS_NAMES}
    else:
        if not args.fg_info or not args.text_feat:
            raise SystemExit("--fg-info and --text-feat required "
                             "(or --synthetic-data N)")
        with open(args.fg_info, "rb") as f:
            infos = pickle.load(f)
        with open(args.text_feat, "rb") as f:
            text_feat = pickle.load(f)
    infos = flatten_uncertainty_infos(infos)

    folds = (
        [int(x) for x in args.folds.split(",")] if args.folds else range(10)
    )
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    model = GLENet(**EXP20_KWARGS)
    for fold_idx in folds:
        ds = ObjectUncertaintyDataset(
            infos, fold_idx, text_feat, training=True,
            point_dims=args.point_dims, rng=rng,
        )
        spe = args.steps_per_epoch or max(-(-len(ds) // args.batch_size), 1)
        total_steps = spe * args.epochs
        tx = make_glenet_optimizer(lr=args.lr, total_steps=total_steps)
        first = next(ds.batches(args.batch_size))
        variables = model.init(
            {"params": jax.random.PRNGKey(args.seed)},
            {k: jnp.asarray(v) for k, v in first.items()},
            rng=jax.random.PRNGKey(args.seed + 1), train=True,
        )
        opt_state = tx.init(variables["params"])
        step = make_glenet_train_step(model, tx)

        def batch_iter():
            # fixed-size batches over reshuffled epochs; the tail batch is
            # KEPT (reference trains drop_last=False) by wrap-filling it from
            # the head of the same shuffled order, so every crop is seen each
            # epoch, the step count matches ceil(n/bs), and the jitted step
            # still sees one static shape
            bs = min(args.batch_size, len(ds))
            while True:
                order_ = rng.permutation(len(ds))
                for start in range(0, len(order_), bs):
                    idx = order_[start : start + bs]
                    if len(idx) < bs:
                        idx = np.concatenate([idx, order_[: bs - len(idx)]])
                    items = [ds[j] for j in idx]
                    yield {
                        k: jnp.asarray(np.stack([item[k] for item in items]))
                        for k in items[0]
                    }

        batches = batch_iter()
        key = jax.random.PRNGKey(args.seed + fold_idx)
        for epoch in range(args.epochs):
            anneal = linear_annealing(0, 1, epoch + 1, args.epochs)
            for _ in range(spe):
                key, k = jax.random.split(key)
                variables, opt_state, metrics = step(
                    variables, opt_state, next(batches), k, anneal
                )
            if epoch % 50 == 0 or epoch == args.epochs - 1:
                print(
                    f"fold {fold_idx} epoch {epoch}: "
                    f"loss={float(metrics['loss']):.4f} "
                    f"reg={float(metrics['reg']):.4f} "
                    f"latent={float(metrics['latent']):.4f}",
                    flush=True,
                )

        with open(out_dir / f"fold_{fold_idx}.pkl", "wb") as f:
            pickle.dump(
                {"variables": jax.device_get(variables),
                 "model_kwargs": dict(EXP20_KWARGS)},
                f,
            )
        print(f"saved {out_dir / f'fold_{fold_idx}.pkl'}")


if __name__ == "__main__":
    main()
