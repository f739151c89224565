#!/usr/bin/env python
"""3D detection evaluation over generated scenes; mirrors
``tools/evaluation/evaluate_3d_detection.py`` (:17-96): run a detector over
generated clouds that correspond to real val-set samples, accumulate pcdet
recall statistics (``pcdet_eval_utils.eval_one_epoch:29-120``) and
nuScenes-protocol per-class AP / mAP, and dump ``result_vxrcnn.pkl`` +
a JSON summary.

Ground truth comes from an info pkl: either the converter's nuScenes infos
(entries with ``gt_boxes``/``gt_names`` keyed by token) or a plain list of
``{"token", "gt_boxes", "gt_names"}`` dicts.  Generated files are matched to
tokens by filename stem suffix, like the reference's
``ObjectDetectionDataset.get_selected_tokens``
(``metrics/datasets/object_detection_dataset.py:21-33``).

Usage:
  python tools/evaluate_detection.py --gen-dir generated_results/our \
      --gt-infos data/nuscenes_infos_val.pkl --pcdet-ckpt voxel_rcnn.pth \
      -o generated_results/our/inference_results
"""

import argparse
import json
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CLASS_NAMES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)


def load_cloud(path: Path) -> np.ndarray:
    if path.suffix == ".npy":
        return np.load(path).astype(np.float32)
    if path.suffix == ".txt":
        return np.loadtxt(path).astype(np.float32)
    return np.fromfile(path, np.float32).reshape(-1, 5)[:, :4]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gen-dir", required=True)
    p.add_argument("--gt-infos", required=True)
    p.add_argument("-o", "--output-dir", required=True)
    p.add_argument("--pcdet-ckpt", default=None,
                   help="released pcdet VoxelRCNN-CenterHead checkpoint "
                        "(the faithful detector); default runs the native "
                        "VoxelDetector with --params/--random-params")
    p.add_argument("--params", default=None)
    p.add_argument("--random-params", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--max-points", type=int, default=32768)
    p.add_argument("--score-thresh", type=float, default=0.1)
    p.add_argument("--classes", nargs="+", default=list(CLASS_NAMES))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lidarcrafter_tpu.metrics.detection_eval import (
        evaluate_detections, load_gt_infos, match_token,
    )

    gt_infos = load_gt_infos(Path(args.gt_infos))
    files = sorted(
        list(Path(args.gen_dir).glob("*.npy"))
        + list(Path(args.gen_dir).glob("*.txt"))
        + list(Path(args.gen_dir).glob("*.bin"))
    )
    pairs = []
    for f in files:
        token = match_token(f.stem, gt_infos)
        if token is not None:
            pairs.append((f, token))
    if args.limit:
        pairs = pairs[: args.limit]
    if not pairs:
        raise SystemExit(
            f"no generated clouds in {args.gen_dir} matched tokens in "
            f"{args.gt_infos}"
        )

    P = args.max_points
    if args.pcdet_ckpt:
        from lidarcrafter_tpu.metrics.models.voxel_rcnn import (
            load_voxel_rcnn_from_pcdet,
        )

        det = load_voxel_rcnn_from_pcdet(
            args.pcdet_ckpt, score_thresh=args.score_thresh
        )

        def run(points, mask):
            boxes, scores, names, valid = det.predict(points, mask)
            keep = np.asarray(valid)
            return (
                np.asarray(boxes)[keep],
                np.asarray(scores)[keep],
                np.asarray(names, object)[keep],
            )
    else:
        from lidarcrafter_tpu.metrics.models.detector import VoxelDetector, predict

        model = VoxelDetector()
        if args.params:
            with open(args.params, "rb") as f:
                params = pickle.load(f)
        elif args.random_params:
            params = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((P, 4)), jnp.ones((P,), bool),
            )
        else:
            raise SystemExit("pass --pcdet-ckpt, --params or --random-params")
        jit_predict = jax.jit(
            lambda pts, m: predict(
                model, params, pts, m, score_thresh=args.score_thresh
            )
        )

        # the substitute detector's 4-class head (extract_foreground.py)
        det_classes = ("car", "truck", "bus", "pedestrian")

        def run(points, mask):
            boxes, scores, labels, valid = jit_predict(points, mask)
            keep = np.asarray(valid)
            names = np.asarray(
                [det_classes[int(l) % len(det_classes)]
                 for l in np.asarray(labels)], object,
            )
            return np.asarray(boxes)[keep], np.asarray(scores)[keep], names[keep]

    det_annos, gt_annos = [], []
    for f, token in pairs:
        cloud = load_cloud(f)
        n = min(len(cloud), P)
        pts = np.zeros((P, max(cloud.shape[1], 4)), np.float32)
        pts[:n] = cloud[:n, : pts.shape[1]]
        mask = np.zeros((P,), bool)
        mask[:n] = True
        boxes, scores, names = run(jnp.asarray(pts[:, :4]), jnp.asarray(mask))
        det_annos.append(
            {"boxes_lidar": boxes, "score": scores, "name": names,
             "frame_id": token}
        )
        gt = gt_infos[token]
        gt_annos.append(
            {"gt_boxes": gt["gt_boxes"], "name": gt["gt_names"]}
        )

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "result_vxrcnn.pkl", "wb") as f:
        pickle.dump(det_annos, f)

    result = evaluate_detections(det_annos, gt_annos, args.classes)
    with open(out_dir / "detection_eval.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
