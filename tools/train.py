#!/usr/bin/env python
"""Train a named experiment; mirrors ``tools/train/train_lidm*.py`` CLIs.

Usage: python tools/train.py -c nuscenes-unet-uncond [--num-steps N] [...]

One driver covers the per-workload scripts of the reference (unconditional,
layout-conditioned, autoregressive) — the config name selects the branch.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synthetic_batches(cfg):
    """Fallback batch source when no nuScenes data is mounted: random range
    images with valid structure (for smoke/bring-up runs only)."""
    import numpy as np

    H, W = cfg.data.resolution
    B = cfg.training.batch_size_train
    rng = np.random.RandomState(cfg.training.seed)
    while True:
        depth = rng.uniform(0, 60, (B, H, W, 1)).astype(np.float32)
        batch = {
            "depth": depth,
            "reflectance": rng.rand(B, H, W, 1).astype(np.float32),
            "mask": (depth > 1.45).astype(np.float32),
        }
        yield batch


def real_batches(cfg, num_workers: int = 0):
    from lidarcrafter_tpu.datasets import __all_datasets__

    ds = __all_datasets__[cfg.data.dataset](cfg)
    B = cfg.training.batch_size_train
    seed = getattr(cfg.training, "seed", 0)
    if num_workers > 0:
        # threaded prefetch over the native projection (GIL-released IO +
        # C++ kernel); cf. the reference's DataLoader(num_workers=...)
        # (train_lidm.py:125)
        from lidarcrafter_tpu.native.loader import PrefetchLoader

        return iter(PrefetchLoader(ds, B, num_workers=num_workers, seed=seed))
    import numpy as np

    def gen():
        # same seeded shuffle stream as PrefetchLoader, so --workers 0/N
        # yield identical batch order
        rng = np.random.RandomState(seed)
        while True:
            order = rng.permutation(len(ds))
            for i in range(0, len(order) - B + 1, B):
                yield ds.collate_fn([ds[j] for j in order[i : i + B]])

    return gen()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", default="nuscenes-unet-uncond")
    parser.add_argument("-b", "--batch_size", type=int, default=None)
    parser.add_argument("--num-steps", type=int, default=None)
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--synthetic-data", action="store_true")
    parser.add_argument("--sp", type=int, default=1, help="azimuth-parallel mesh axis")
    parser.add_argument("--workers", type=int, default=2,
                        help="prefetch threads for real data (0 = synchronous)")
    parser.add_argument("--text-features", default=None, help="CLIP class-text table pkl (object branch)")
    parser.add_argument(
        "--resume", nargs="?", const="auto", default=None,
        help="resume from a checkpoint dir, or (no value) the newest "
             "ckpt_* in --output-dir; restores params/EMA/optimizer/step "
             "(cf. train_lidm.py:294-300)",
    )
    parser.add_argument("--log-dir", default=None,
                        help="JSONL/TensorBoard tracker output dir")
    args = parser.parse_args()

    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.parallel import make_mesh
    from lidarcrafter_tpu.training.loop import (
        FlowTrainer,
        LayoutTrainer,
        ObjectTrainer,
        Trainer,
    )

    cfg = get_config(args.cfg)
    if args.batch_size:
        cfg.training.batch_size_train = args.batch_size

    mesh = make_mesh(sp=args.sp)
    if getattr(cfg, "flow", None) is not None:
        data = synthetic_batches(cfg) if args.synthetic_data else real_batches(cfg, args.workers)
        trainer = FlowTrainer(cfg, data, mesh=mesh, output_dir=args.output_dir)
    elif getattr(cfg.data, "task", None) == "layout_generation" and cfg.model.architecture == "unet_1d":
        from lidarcrafter_tpu.datasets import __all_datasets__
        from lidarcrafter_tpu.datasets.scene_graph import collate_scene_graphs

        ds = __all_datasets__[cfg.data.dataset](cfg)
        import numpy as np

        # re-encode edited relationship text at collate time with the
        # assigner's encoder (cf. nuscenes_dataset.py:571-576); without one,
        # train-time graph edits would keep stale pre-edit CLIP features
        encode_fn = getattr(
            getattr(ds, "scene_graph_assigner", None), "text_encode_fn", None
        )
        if encode_fn is None:
            print("WARNING: no text_encode_fn on the dataset's scene-graph "
                  "assigner — edited relationships keep pre-edit CLIP features")

        def layout_batches():
            B = cfg.training.batch_size_train
            order = np.random.permutation(len(ds))
            while True:
                for i in range(0, len(order) - B + 1, B):
                    yield collate_scene_graphs(
                        [ds[j] for j in order[i : i + B]],
                        text_encode_fn=encode_fn,
                    )
                order = np.random.permutation(len(ds))

        trainer = LayoutTrainer(cfg, layout_batches(), mesh=mesh, output_dir=args.output_dir)
    elif getattr(cfg.data, "task", None) == "object_generation":
        import numpy as np
        import pickle

        data = real_batches(cfg, args.workers)
        text = (
            pickle.load(open(args.text_features, "rb"))
            if args.text_features
            else np.zeros((len(cfg.data.class_names), 512), np.float32)
        )
        trainer = ObjectTrainer(cfg, data, text, mesh=mesh, output_dir=args.output_dir)
    else:
        data = synthetic_batches(cfg) if args.synthetic_data else real_batches(cfg, args.workers)
        trainer = Trainer(cfg, data, mesh=mesh, output_dir=args.output_dir)
    if args.log_dir:
        from lidarcrafter_tpu.training.tracker import JsonlTracker

        trainer.tracker = JsonlTracker(args.log_dir)
    trainer.train(num_steps=args.num_steps, resume=args.resume)


if __name__ == "__main__":
    main()
