#!/usr/bin/env bash
# Offline data-preparation pipeline; mirrors the reference's
# scripts/create_data.sh (steps 1-6, SURVEY.md §2.5) with this repo's CLIs.
#
# Prereqs: nuScenes at data/nuscenes (devkit for step 1), the released CLIP
# ViT-B/32 torch checkpoint + BPE vocab for steps 3-4 (native JAX text tower
# — no torch CLIP / GPU needed).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

ROOT=${NUSC_ROOT:-data/nuscenes}
OUT=${INFO_OUT:-data/infos}
CLIP=${CLIP_CKPT:-pretrained_models/ViT-B-32.pt}
BPE=${CLIP_BPE:-pretrained_models/bpe_simple_vocab_16e6.txt.gz}

# 1. nuScenes info pkls (boxes, velocities, 6-step future trajectories)
python tools/converters/nuscenes_converter.py --root "$ROOT" -o "$OUT" \
    --version "${NUSC_VERSION:-v1.0-trainval}"

# 2. scene-graph annotation happens inside step 1 here (build_scene_graph_info
#    is applied while writing the info pkls - no separate pass needed)

# 3. CLIP class-text features (native tower)
python tools/converters/build_clip_cache.py obj-text \
    --clip "$CLIP" --bpe "$BPE" --save_path "$OUT/obj_text_feat.pkl"

# 4. warm the per-sample scene-graph CLIP cache (over the step-1 infos)
python tools/converters/build_clip_cache.py warm-cache \
    --clip "$CLIP" --bpe "$BPE" --config nuscenes-layout \
    --pkl "$OUT/nuscenes_infos_train.pkl" --data_root "$ROOT"

# 4b. (optional) lidarseg label paths for the RangeNet semantic trainer
#     (reference add_lidarseg_token.py)
if [ -n "${WITH_LIDARSEG:-}" ]; then
  python tools/converters/add_lidarseg.py --root "$ROOT" \
      --infos "$OUT/nuscenes_infos_train.pkl" "$OUT/nuscenes_infos_val.pkl" \
      --version "${NUSC_VERSION:-v1.0-trainval}"
fi

# 5. pre-generated object-branch box conditions
if [ -n "${OBJECT_CKPT:-}" ]; then
  python tools/generate_box_condition.py --ckpt "$OBJECT_CKPT"
else
  python tools/generate_box_condition.py --random-params
fi

# 6. object classification split (over the gt-database infos — an external
#    artifact the reference also consumes, not produced by steps 1-5;
#    see OpenPCDet's nuscenes gt-database generation)
DBINFOS=${DBINFOS:-data/infos/nuscenes_dbinfos_10sweeps_withvelo.pkl}
python tools/converters/split_object_dataset.py --dbinfos "$DBINFOS"
