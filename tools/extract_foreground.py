#!/usr/bin/env python
"""Run a 3D detector over generated clouds and extract per-detection
foreground samples (DCF pipeline); mirrors
``tools/evaluation/extract_foreground_samples.py`` (ForegroundSampleExtractor):
detector inference → result.pkl → in-box point crops (≥50 points) centered at
their boxes → foreground_samples/*.bin + foreground_samples_info.pkl, the
input of ``metrics.fg_object.compute_dcf``.

The detector is the native :class:`VoxelDetector`
(``lidarcrafter_tpu/metrics/models/detector.py``) — pass --params for trained
weights or --random-params for a pipeline smoke run.

Usage:
  python tools/extract_foreground.py --gen-dir generated_results/ours \
      -o generated_results/ours/inference_results [--limit N]
"""

import argparse
import pickle
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CLASS_NAMES = ("car", "truck", "bus", "pedestrian")


def load_cloud(path: Path) -> np.ndarray:
    if path.suffix == ".npy":
        return np.load(path).astype(np.float32)
    if path.suffix == ".txt":
        return np.loadtxt(path).astype(np.float32)
    return np.fromfile(path, np.float32).reshape(-1, 5)[:, :4]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gen-dir", required=True)
    p.add_argument("-o", "--output-dir", required=True)
    p.add_argument("--params", default=None, help="msgpack/pkl of detector params")
    p.add_argument("--random-params", action="store_true")
    p.add_argument("--pcdet-ckpt", default=None,
                   help="released pcdet VoxelRCNN-CenterHead checkpoint "
                        "(reference extract_foreground_samples.py:25) — runs "
                        "the faithful ingestion path instead of VoxelDetector")
    p.add_argument("--gt-infos", default=None,
                   help="info pkl with gt_boxes/gt_names per token: extract "
                        "foreground with GROUND-TRUTH boxes instead of a "
                        "detector (the 'ori' control arm / cross-method "
                        "path; cf. extract_opendwm_foreground_points.py)")
    p.add_argument("--keep-classes", nargs="+", default=None,
                   help="class filter for --gt-infos mode (reference "
                        "default: car truck bus)")
    p.add_argument("--frame-rotate-deg", type=float, default=0.0,
                   help="rotate loaded clouds around z before extraction "
                        "(opendwm txt clouds need 90; cf. "
                        "extract_opendwm_foreground_points.py:26-28)")
    p.add_argument("--z-offset", type=float, default=0.0,
                   help="z shift applied after rotation (opendwm: -2.0)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--max-points", type=int, default=32768)
    p.add_argument("--score-thresh", type=float, default=0.3)
    p.add_argument("--min-points", type=int, default=50)
    p.add_argument("--voxel-size", type=float, default=0.3)
    p.add_argument("--point-range", type=float, nargs=6,
                   default=(-54.0, -54.0, -5.0, 54.0, 54.0, 3.0))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lidarcrafter_tpu.metrics.models.detector import VoxelDetector, predict
    from lidarcrafter_tpu.ops.points import points_in_boxes

    files = sorted(
        list(Path(args.gen_dir).glob("*.npy"))
        + list(Path(args.gen_dir).glob("*.txt"))
        + list(Path(args.gen_dir).glob("*.bin"))
    )
    if args.limit:
        files = files[: args.limit]
    if not files:
        raise SystemExit(f"no generated clouds found in {args.gen_dir}")

    P = args.max_points
    gt_infos = None
    if args.gt_infos:
        from lidarcrafter_tpu.metrics.detection_eval import (
            load_gt_infos, match_token,
        )

        gt_infos = load_gt_infos(args.gt_infos)
        keep = args.keep_classes or ["car", "truck", "bus"]

        def gt_boxes_for(stem):
            """GT-box 'detections' for one generated file; cf.
            ``extract_opendwm_foreground_points.py:23-48``."""
            token = match_token(stem, gt_infos)
            if token is None:
                return None
            gi = gt_infos[token]
            sel = np.asarray([n in keep for n in gi["gt_names"]], bool)
            boxes = gi["gt_boxes"][sel].astype(np.float32)
            names = np.asarray(gi["gt_names"])[sel]
            return boxes, np.ones((len(boxes),), np.float32), names

        det_fn = None
    elif args.pcdet_ckpt:
        from lidarcrafter_tpu.metrics.models.voxel_rcnn import (
            load_voxel_rcnn_from_pcdet,
        )

        det = load_voxel_rcnn_from_pcdet(
            args.pcdet_ckpt, point_range=tuple(args.point_range),
            score_thresh=args.score_thresh,
        )

        def det_fn(pts, msk):
            boxes, scores, names, valid = det.predict(pts, msk)
            labels = np.array(
                [CLASS_NAMES.index(n) if n in CLASS_NAMES else -1 for n in names],
                np.int32,
            )
            # detections outside the DCF class set are dropped (labels -1)
            return boxes, scores, jnp.asarray(np.maximum(labels, 0)), (
                jnp.asarray(valid) & jnp.asarray(labels >= 0)
            )
    else:
        model = VoxelDetector(voxel_size=args.voxel_size,
                              point_range=tuple(args.point_range))
        dummy = (jnp.zeros((P, 4)), jnp.ones((P,), bool))
        if args.params:
            with open(args.params, "rb") as f:
                params = pickle.load(f)
        elif args.random_params:
            params = model.init(jax.random.PRNGKey(0), *dummy)
        else:
            raise SystemExit("pass --params <file> or --random-params")

        det_fn = jax.jit(
            lambda pts, msk: predict(model, params, pts, msk,
                                     score_thresh=args.score_thresh)
        )

    out = Path(args.output_dir)
    (out / "foreground_samples").mkdir(parents=True, exist_ok=True)

    det_annos = []
    info = defaultdict(list)
    for frame_id, f in enumerate(files):
        cloud = load_cloud(f)[:, :4]
        if args.frame_rotate_deg:
            a = np.deg2rad(args.frame_rotate_deg)
            rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]],
                           np.float32)
            cloud = cloud.copy()
            cloud[:, :2] = cloud[:, :2] @ rot.T
        if args.z_offset:
            cloud = cloud.copy()
            cloud[:, 2] += args.z_offset
        n = min(len(cloud), P)
        pts = np.zeros((P, 4), np.float32)
        pts[:n] = cloud[:n]
        mask = np.arange(P) < n
        if gt_infos is not None:
            got = gt_boxes_for(f.stem)
            if got is None:
                print(f"[{frame_id + 1}/{len(files)}] {f.stem}: no token match")
                continue
            boxes, scores, names = got
        else:
            boxes, scores, labels, keep = (
                np.asarray(a)
                for a in det_fn(jnp.asarray(pts), jnp.asarray(mask))
            )
            boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
            names = np.array([CLASS_NAMES[i] for i in labels])
        det_annos.append(
            {"frame_id": str(frame_id), "name": names,
             "boxes_lidar": boxes, "score": scores}
        )
        # foreground crops
        if len(boxes):
            inb = np.asarray(
                points_in_boxes(
                    jnp.asarray(pts[:, :3]), jnp.asarray(boxes.astype(np.float32))
                )
            )  # (M, N)
            for sid in range(len(boxes)):
                sel = pts[inb[sid] & mask]
                if len(sel) < args.min_points:
                    continue
                crop = sel.copy()
                crop[:, :3] -= boxes[sid, None, :3]
                path = out / "foreground_samples" / f"{frame_id}_{names[sid]}_{sid}.bin"
                crop.astype(np.float32).tofile(path)
                info[names[sid]].append(
                    {
                        "name": names[sid],
                        "path": str(path),
                        "num_points_in_gt": len(sel),
                        "box3d_lidar": boxes[sid].tolist(),
                        "score": float(scores[sid]),
                    }
                )
        print(f"[{frame_id + 1}/{len(files)}] dets={len(boxes)}")

    with open(out / "result.pkl", "wb") as f:
        pickle.dump(det_annos, f)
    with open(out / "foreground_samples_info.pkl", "wb") as f:
        pickle.dump(dict(info), f)
    counts = {k: len(v) for k, v in info.items()}
    print(f"foreground samples: {counts} → {out / 'foreground_samples_info.pkl'}")


if __name__ == "__main__":
    main()
