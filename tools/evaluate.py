#!/usr/bin/env python
"""Metric suite over generated vs. reference clouds; mirrors
``tools/evaluation/evaluate_our.py`` CLI shape.

Usage: python tools/evaluate.py --real DIR --gen DIR -m cd jsd mmd
Point files: .txt (N,>=3) or .npy.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _load_dir(d, limit=None):
    from lidarcrafter_tpu.utils.sample_io import list_sample_files, load_point_file

    out = [load_point_file(f)[:, :3] for f in list_sample_files(d, limit)]
    if not out:
        raise SystemExit(f"no .txt/.npy/.bin/.pth point files found in {d}")
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--real", required=True)
    parser.add_argument("--gen", required=True)
    parser.add_argument("-m", "--metrics", nargs="+", default=["cd", "jsd", "mmd"])
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--data", default="32", choices=["32", "64"])
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--pretrained-root", default=None,
                        help="eval-backbone checkpoints dir for fsvd/fpvd "
                             "({root}/{dataset}/{model}/model.ckpt)")
    parser.add_argument("--sparse-max-points", type=int, default=32768)
    args = parser.parse_args()

    from lidarcrafter_tpu.metrics import evaluate

    real = _load_dir(args.real, args.limit)
    gen = _load_dir(args.gen, args.limit)
    results = evaluate(real, gen, metrics=args.metrics, data=args.data,
                       pretrained_root=args.pretrained_root,
                       max_points=args.sparse_max_points)
    if args.output:
        import json

        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
