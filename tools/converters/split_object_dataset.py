#!/usr/bin/env python
"""Object-classification train/val split (data pipeline step 6); mirrors
``tools/data_converter/split_train_val_nusc_object.py`` CLI.

Usage: python tools/converters/split_object_dataset.py \
    --dbinfos data/infos/nuscenes_dbinfos_10sweeps_withvelo.pkl -o data/infos
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dbinfos", required=True)
    p.add_argument("-o", "--output-dir", default="data/infos")
    p.add_argument("--sample-num", type=int, default=10000)
    p.add_argument("--min-points", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from lidarcrafter_tpu.datasets.converter import split_object_dataset

    with open(args.dbinfos, "rb") as f:
        fg_objects = pickle.load(f)
    train, val = split_object_dataset(
        fg_objects, sample_num=args.sample_num,
        min_points=args.min_points, seed=args.seed,
    )
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "nuscenes_object_classification_train.pkl", "wb") as f:
        pickle.dump(train, f)
    with open(out / "nuscenes_object_classification_val.pkl", "wb") as f:
        pickle.dump(val, f)
    print(f"Train data size: {len(train)}")
    print(f"Validation data size: {len(val)}")


if __name__ == "__main__":
    main()
