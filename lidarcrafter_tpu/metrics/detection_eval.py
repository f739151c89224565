"""3D detection evaluation over generated scenes.

TPU-native equivalent of the reference's detection-metric arm
(``tools/evaluation/evaluate_3d_detection.py:17-96`` driving pcdet's
``eval_one_epoch``, ``lidargen/metrics/utils/pcdet_eval_utils.py:22-122``):

- **box recall** at IoU thresholds (pcdet ``recall_rcnn_{0.3,0.5,0.7}``
  semantics: a GT box counts as recalled when ANY detection overlaps it with
  rotated 3D IoU >= threshold, class-agnostic;
  ``pcdet/models/detectors/detector3d_template.py`` generate_recall_record).
- **nuScenes-protocol AP** (the reference's ``dataset.evaluation`` via the
  nuScenes devkit): per class and center-distance threshold, greedy
  score-descending matching on BEV center distance, 101-point interpolated
  precision/recall, AP normalized over recall/precision in [0.1, 1]
  (devkit ``detection/algo.py`` accumulate/calc_ap).

The IoU matrix runs jitted on device (``ops/iou3d.boxes_iou3d``); the
matching/AP bookkeeping is tiny host-side numpy, exactly like the devkit.

Annotation format (pcdet ``det_annos`` convention):
  det:  {"boxes_lidar": (N, 7), "score": (N,), "name": (N,) str}
  gt:   {"gt_boxes": (M, 7), "name": (M,) str}
with one dict per sample, det/gt lists aligned by index.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.iou3d import boxes_iou3d

DEFAULT_RECALL_THRESHOLDS = (0.3, 0.5, 0.7)
DEFAULT_DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)


def load_gt_infos(path) -> dict:
    """Info pkl → token → {"gt_boxes": (M, 7), "gt_names": (M,)}.

    Accepts the converter's nuScenes infos (``{"infos": [...]}`` wrapper,
    like the reference's ``nuscenes_infos_val.pkl``) or a plain list of
    ``{"token", "gt_boxes", "gt_names"}`` dicts."""
    import pickle

    with open(path, "rb") as f:
        obj = pickle.load(f)
    if isinstance(obj, dict) and "infos" in obj:
        obj = obj["infos"]
    out = {}
    for info in obj:
        token = info.get("token") or info.get("sample_token")
        boxes = np.asarray(info["gt_boxes"], np.float32)
        boxes = boxes.reshape(-1, boxes.shape[-1] if boxes.ndim == 2 else 7)
        names = np.asarray(info.get("gt_names", info.get("names")))
        out[str(token)] = {"gt_boxes": boxes[:, :7], "gt_names": names}
    return out


def match_token(stem: str, tokens) -> str | None:
    """Generated-file stem → sample token.  Reference convention: the token
    is the last '_'-separated chunk of the stem
    (``metrics/datasets/object_detection_dataset.py:30-31``); falls back to
    the full stem (``extract_opendwm_foreground_points.py:63``)."""
    cand = stem.split(".")[0].split("_")[-1]
    if cand in tokens:
        return cand
    return stem if stem in tokens else None


@jax.jit
def _max_iou_per_gt(det_boxes: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) dets × (M, 7) GTs → (M,) best rotated-3D IoU per GT."""
    iou = boxes_iou3d(det_boxes, gt_boxes)  # (N, M)
    return jnp.max(iou, axis=0)


def _pad_boxes(boxes: np.ndarray, bucket: int = 32) -> np.ndarray:
    """Pad (N, 7) to the next multiple of ``bucket`` with zero-size boxes
    (volume 0 → IoU 0 against everything), bounding the number of distinct
    shapes ``_max_iou_per_gt`` compiles for — per-sample det/GT counts vary
    freely across an eval run."""
    n = len(boxes)
    m = max(bucket, -(-n // bucket) * bucket)
    if m == n:
        return boxes
    out = np.zeros((m, 7), np.float32)
    out[:n] = boxes
    return out


def _as_boxes7(arr) -> np.ndarray:
    """Normalize a box array to (N, 7): IoU / matching reads only the 7
    geometry columns, so tolerate 9-dim boxes carrying velocity columns
    (nuScenes converter format) and single flat (7,)/(9,) boxes."""
    a = np.asarray(arr, np.float32)
    if a.size == 0:
        return a.reshape(0, 7)
    if a.ndim == 1:
        a = a.reshape(1, -1)
    return a.reshape(len(a), -1)[:, :7]


def box_recall_counts(
    det_boxes: np.ndarray,
    gt_boxes: np.ndarray,
    thresholds=DEFAULT_RECALL_THRESHOLDS,
) -> dict:
    """One sample's recall tallies; cf. ``pcdet_eval_utils.statistics_info``
    (:12-19) accumulating ``recall_rcnn_*`` / ``gt_num``."""
    det7, gt7 = _as_boxes7(det_boxes), _as_boxes7(gt_boxes)
    out = {f"recall_rcnn_{t}": 0 for t in thresholds}
    out["gt_num"] = int(len(gt7))
    if len(gt7) == 0 or len(det7) == 0:
        return out
    best = np.asarray(
        _max_iou_per_gt(
            jnp.asarray(_pad_boxes(det7)),
            jnp.asarray(_pad_boxes(gt7)),
        )
    )[: len(gt7)]
    for t in thresholds:
        out[f"recall_rcnn_{t}"] = int((best >= t).sum())
    return out


def _accumulate_class(
    det_annos: list[dict],
    gt_annos: list[dict],
    class_name: str,
    dist_th: float,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Greedy center-distance matching for one (class, threshold).

    Mirrors the nuScenes devkit ``accumulate``: pool all predictions of
    ``class_name`` across samples, sort by score descending, and match each
    to the nearest still-unmatched same-class GT in its sample when the BEV
    center distance is below ``dist_th``.

    Returns (scores_sorted, tp_flags, n_gt).
    """
    preds = []  # (score, sample_idx, x, y)
    for i, det in enumerate(det_annos):
        names = np.asarray(det["name"])
        sel = np.flatnonzero(names == class_name)
        boxes = _as_boxes7(det["boxes_lidar"])
        scores_i = np.asarray(det["score"], np.float64).reshape(-1)
        for j in sel:
            b = boxes[j]
            preds.append((float(scores_i[j]), i, float(b[0]), float(b[1])))
    gts = {}
    n_gt = 0
    for i, gt in enumerate(gt_annos):
        names = np.asarray(gt["name"])
        sel = np.flatnonzero(names == class_name)
        boxes = _as_boxes7(gt["gt_boxes"])
        gts[i] = [boxes[j][:2].astype(np.float64) for j in sel]
        n_gt += len(sel)
    preds.sort(key=lambda p: -p[0])
    taken: dict[int, set] = defaultdict(set)
    scores = np.array([p[0] for p in preds], np.float64)
    tp = np.zeros(len(preds), bool)
    for k, (_, i, x, y) in enumerate(preds):
        best_d, best_j = np.inf, None
        for j, c in enumerate(gts.get(i, [])):
            if j in taken[i]:
                continue
            d = float(np.hypot(c[0] - x, c[1] - y))
            if d < best_d:
                best_d, best_j = d, j
        if best_j is not None and best_d < dist_th:
            tp[k] = True
            taken[i].add(best_j)
    return scores, tp, n_gt


def calc_ap(
    tp: np.ndarray,
    n_gt: int,
    min_recall: float = 0.1,
    min_precision: float = 0.1,
) -> float:
    """101-point interpolated AP with the nuScenes normalization
    (devkit ``algo.calc_ap``): operating points below 10% recall or 10%
    precision contribute zero, and the area is renormalized by
    ``1 - min_precision``.  ``tp`` must be ordered by descending score."""
    if n_gt == 0 or len(tp) == 0:
        return 0.0
    tps = np.cumsum(tp).astype(np.float64)
    fps = np.cumsum(~tp).astype(np.float64)
    prec = tps / (tps + fps)
    rec = tps / n_gt
    rec_interp = np.linspace(0.0, 1.0, 101)
    prec_interp = np.interp(rec_interp, rec, prec, right=0.0)
    prec_interp = prec_interp[int(round(100 * min_recall)) + 1 :]
    prec_interp = np.maximum(prec_interp - min_precision, 0.0)
    return float(np.mean(prec_interp)) / (1.0 - min_precision)


def evaluate_detections(
    det_annos: list[dict],
    gt_annos: list[dict],
    class_names,
    dist_thresholds=DEFAULT_DIST_THRESHOLDS,
    recall_thresholds=DEFAULT_RECALL_THRESHOLDS,
) -> dict:
    """Full detection evaluation → the reference's result dict shape
    (``pcdet_eval_utils.eval_one_epoch:85-120`` recall block +
    per-class AP / mAP from ``dataset.evaluation``)."""
    assert len(det_annos) == len(gt_annos)
    tallies = {f"recall_rcnn_{t}": 0 for t in recall_thresholds}
    tallies["gt_num"] = 0
    for det, gt in zip(det_annos, gt_annos):
        # box_recall_counts normalizes shapes itself (flat (7,)/(9,) singles,
        # velocity columns, empties) — pre-reshaping here would mangle a flat
        # single box (7,) into 7 one-column rows.
        c = box_recall_counts(det["boxes_lidar"], gt["gt_boxes"], recall_thresholds)
        for k, v in c.items():
            tallies[k] += v

    result = {}
    denom = max(tallies["gt_num"], 1)
    for t in recall_thresholds:
        result[f"recall/rcnn_{t}"] = tallies[f"recall_rcnn_{t}"] / denom
    result["gt_num"] = tallies["gt_num"]

    ap_table = {}
    for cls in class_names:
        per_th = {}
        for d in dist_thresholds:
            scores, tp, n_gt = _accumulate_class(det_annos, gt_annos, cls, d)
            per_th[f"dist_{d}"] = calc_ap(tp, n_gt)
        per_th["mean"] = float(np.mean(list(per_th.values()))) if per_th else 0.0
        ap_table[cls] = per_th
    result["ap"] = ap_table
    aps = [v["mean"] for v in ap_table.values()]
    result["mAP"] = float(np.mean(aps)) if aps else 0.0
    n_pred = sum(len(np.asarray(d["name"])) for d in det_annos)
    result["avg_pred_objects"] = n_pred / max(len(det_annos), 1)
    return result
