#!/usr/bin/env python
"""CLIP text-feature pipeline steps with the NATIVE JAX text tower.

Replaces the reference's torch+clip steps 3 and 4
(``scripts/create_data.sh``):

- ``obj-text``  → per-class text features → ``obj_text_feat.pkl``
  (``tools/data_converter/generate_nusc_obj_text_feature.py:5-27``)
- ``warm-cache`` → iterate a dataset split so the SceneGraphAssigner writes
  its ``CLIP_%07d.pkl`` cache
  (``tools/data_converter/prepare_scene_graph_feat.py:9-22``)

Both need the OpenAI CLIP ViT-B/32 weights (TorchScript ``.pt`` or a plain
state_dict) and the ``bpe_simple_vocab_16e6.txt.gz`` merges file.

Usage:
  python tools/converters/build_clip_cache.py obj-text \
      --clip ViT-B-32.pt --bpe bpe_simple_vocab_16e6.txt.gz \
      --save_path data/infos/obj_text_feat.pkl
  python tools/converters/build_clip_cache.py warm-cache \
      --clip ViT-B-32.pt --bpe bpe_simple_vocab_16e6.txt.gz \
      --config nuscenes-layout --pkl data/infos/..._train.pkl
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

# reference class list, including its 'unkonwn' spelling — cache keys must
# match (generate_nusc_obj_text_feature.py:10)
CLASS_NAMES = (
    "unkonwn", "car", "truck", "construction_vehicle", "bus", "trailer",
    "motorcycle", "bicycle", "pedestrian",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["obj-text", "warm-cache"])
    p.add_argument("--clip", required=True, help="CLIP checkpoint (.pt)")
    p.add_argument("--bpe", required=True, help="bpe_simple_vocab_16e6.txt.gz")
    p.add_argument("--save_path", default="data/infos/obj_text_feat.pkl")
    # warm-cache needs a config whose task builds the scene-graph assigner
    # (layout_generation -> nuscenes-layout); layout_cond configs never
    # create one (ADVICE r2: AttributeError with the old default)
    p.add_argument("--config", default="nuscenes-layout")
    p.add_argument("--pkl", help="info pkl for warm-cache")
    p.add_argument("--data_root", default="data/nuscenes")
    p.add_argument("--split", default="train")
    args = p.parse_args()

    from lidarcrafter_tpu.models.clip_text import load_clip_text_encoder

    encode_fn, _, _, _ = load_clip_text_encoder(args.clip, args.bpe)

    if args.cmd == "obj-text":
        feats = encode_fn(list(CLASS_NAMES))
        out = {name: feats[i : i + 1] for i, name in enumerate(CLASS_NAMES)}
        with open(args.save_path, "wb") as f:
            pickle.dump(out, f, protocol=pickle.HIGHEST_PROTOCOL)
        print(f"wrote {len(out)} class features -> {args.save_path}")
        return

    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.datasets import __all_datasets__

    cfg = get_config(args.config)
    cfg.data.split = args.split
    cfg.data.data_root = args.data_root
    if args.pkl:
        cfg.data.pkl_path = args.pkl
    ds = __all_datasets__[cfg.data.dataset](cfg)
    if not hasattr(ds, "scene_graph_assigner"):
        raise SystemExit(
            f"config {args.config!r} (task {cfg.data.task!r}) builds no "
            "scene-graph assigner - use a layout_generation config such as "
            "nuscenes-layout"
        )
    ds.scene_graph_assigner.text_encode_fn = encode_fn
    for i in range(len(ds)):
        ds[i]  # assign_item writes CLIP_%07d.pkl on cache miss
        if i % 500 == 0:
            print(f"warmed {i}/{len(ds)}")
    print(f"cache warmed for {len(ds)} samples")


if __name__ == "__main__":
    main()
