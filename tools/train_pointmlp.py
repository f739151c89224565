#!/usr/bin/env python
"""Train the PointMLP foreground-object classifier; mirrors
``tools/train/train_classification_pointmlp.py``.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pkl-path", default=None, help="object db pkl (GT database)")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--lr", type=float, default=0.1)
    parser.add_argument("--min-lr", type=float, default=0.005)
    parser.add_argument("--num-classes", type=int, default=4)
    parser.add_argument("--points", type=int, default=1024)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--synthetic-data", action="store_true")
    parser.add_argument("-o", "--output", default="logs/pointmlp")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from lidarcrafter_tpu.metrics.extractor.pointmlp import point_mlp
    from lidarcrafter_tpu.training.classifier import (
        make_classifier_optimizer,
        make_classifier_train_step,
    )

    rng = np.random.RandomState(args.seed)

    def batches():
        if args.synthetic_data:
            while True:
                pts = rng.randn(args.batch_size, args.points, 3).astype(np.float32)
                labels = rng.randint(0, args.num_classes, args.batch_size)
                yield {"points": jnp.asarray(pts), "labels": jnp.asarray(labels)}
        else:
            from lidarcrafter_tpu.configs import get_config
            from lidarcrafter_tpu.datasets import NuscObjectDataset

            cfg = get_config("nuscenes-object")
            if args.pkl_path:
                cfg.data.pkl_path = args.pkl_path
            ds = NuscObjectDataset(cfg)
            order = rng.permutation(len(ds))
            while True:
                for i in range(0, len(order) - args.batch_size + 1, args.batch_size):
                    items = [ds[j] for j in order[i : i + args.batch_size]]
                    yield {
                        "points": jnp.asarray(
                            np.stack([it["fg_points"][:, :3] for it in items])
                        ),
                        "labels": jnp.asarray(
                            np.concatenate([it["fg_class"] for it in items])
                        ),
                    }
                order = rng.permutation(len(ds))

    model = point_mlp(num_classes=args.num_classes, points=args.points)
    data = batches()
    first = next(data)
    variables = model.init(jax.random.PRNGKey(args.seed), first["points"][:1])
    tx = make_classifier_optimizer(
        lr=args.lr, min_lr=args.min_lr, epochs=args.epochs, steps_per_epoch=1
    )
    opt_state = tx.init(variables["params"])
    step = make_classifier_train_step(model, tx)

    key = jax.random.PRNGKey(args.seed)
    for i in range(args.epochs):
        batch = next(data)
        key, k = jax.random.split(key)
        variables, opt_state, loss, acc = step(variables, opt_state, batch, k)
        if i % 10 == 0 or i == args.epochs - 1:
            print(f"epoch {i}: loss={float(loss):.4f} acc={float(acc):.3f}")

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    import pickle

    with open(out / "pointmlp_variables.pkl", "wb") as f:
        pickle.dump(jax.device_get(variables), f)
    print(f"saved classifier to {out}")


if __name__ == "__main__":
    main()
