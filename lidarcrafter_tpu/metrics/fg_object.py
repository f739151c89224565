"""Object-level metrics: CGF, RGF, DCF.

Re-designs ``lidargen/metrics/fg_object.py`` (531 LoC) without pandas/sklearn:

- **CGF** (:190-231): PointMLP classification accuracy + precision/recall/F1,
  binned by foreground point count — the inference driver runs our flax
  PointMLP (``extractor.pointmlp``) over normalized object clouds;
- **RGF** (:456-500): GLENet uncertainty statistics aggregated over folds ×
  MC passes, binned by point count (the metric consumes per-object
  ``{variance, overlap, pointnum}`` records);
- **DCF** (:502-531): mean detector confidence per class.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Sequence

import numpy as np

CGF_BINS = (0, 100, 200, 300, 400, 500, np.inf)
CGF_LABELS = ("<100", "100-200", "200-300", "300-400", "400-500", ">500")
RGF_BINS = (0, 150, 300, np.inf)
RGF_LABELS = ("<150", "150-300", ">300")


def _bin_labels(values, bins, labels):
    """pd.cut(include_lowest=True) semantics: (lo, hi], first bin closed."""
    values = np.asarray(values, float)
    out = np.full(len(values), -1)
    for i, (lo, hi) in enumerate(zip(bins[:-1], bins[1:])):
        if i == 0:
            mask = (values >= lo) & (values <= hi)
        else:
            mask = (values > lo) & (values <= hi)
        out[np.where(mask & (out == -1))[0]] = i
    return out


def precision_recall_f1(y_true, y_pred, num_classes):
    """sklearn precision_recall_fscore_support(zero_division=0) semantics."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    p, r, f, s = [], [], [], []
    for c in range(num_classes):
        tp = np.sum((y_pred == c) & (y_true == c))
        fp = np.sum((y_pred == c) & (y_true != c))
        fn = np.sum((y_pred != c) & (y_true == c))
        prec = tp / (tp + fp) if (tp + fp) > 0 else 0.0
        rec = tp / (tp + fn) if (tp + fn) > 0 else 0.0
        f1 = 2 * prec * rec / (prec + rec) if (prec + rec) > 0 else 0.0
        p.append(prec)
        r.append(rec)
        f.append(f1)
        s.append(int(np.sum(y_true == c)))
    return np.array(p), np.array(r), np.array(f), np.array(s)


def compute_classification_metrics_fixed_bins(
    result_dict: dict, bins=CGF_BINS, labels=CGF_LABELS
) -> dict:
    """cf. ``fg_object.py:120-188``."""
    class_names = list(result_dict["class_names"])
    y_true = np.asarray(result_dict["test_true"])
    y_pred = np.asarray(result_dict["test_pred"])
    pts = np.asarray(result_dict["num_points_in_gt"])

    def stats(yt, yp):
        acc = float(np.mean(yt == yp)) if len(yt) else 0.0
        p, r, f, s = precision_recall_f1(yt, yp, len(class_names))
        per_class = {
            name: {"precision": float(p[i]), "recall": float(r[i]),
                   "f1-score": float(f[i]), "support": int(s[i])}
            for i, name in enumerate(class_names)
        }
        return {"accuracy": acc, "per_class": per_class}

    out = {"overall": stats(y_true, y_pred), "partitions": {}}
    bin_idx = _bin_labels(pts, bins, labels)
    for i, lbl in enumerate(labels):
        mask = bin_idx == i
        if not mask.any():
            continue
        out["partitions"][lbl] = stats(y_true[mask], y_pred[mask])
    return out


def compute_cgf(
    classifier_apply,
    object_clouds: Sequence[np.ndarray],
    labels: Sequence[int],
    num_points_in_gt: Sequence[int],
    class_names: Sequence[str],
    batch_size: int = 32,
) -> dict:
    """CGF driver; cf. ``fg_object.py:190-231`` + ``validate_classification``.

    ``classifier_apply(points (B, N, 3)) -> logits (B, num_classes)`` — e.g.
    a bound flax PointMLP.  Objects are box-normalized clouds.
    """
    import jax.numpy as jnp

    preds = []
    clouds = np.stack([np.asarray(c)[:, :3] for c in object_clouds])
    for i in range(0, len(clouds), batch_size):
        logits = np.asarray(classifier_apply(jnp.asarray(clouds[i : i + batch_size])))
        preds.extend(np.argmax(logits, axis=1).tolist())
    result_dict = {
        "class_names": list(class_names),
        "test_true": np.asarray(labels),
        "test_pred": np.asarray(preds),
        "num_points_in_gt": np.asarray(num_points_in_gt),
    }
    return compute_classification_metrics_fixed_bins(result_dict)


def compute_regression_metrics_fixed_bins(
    result_json: dict, bins=RGF_BINS, labels=RGF_LABELS
) -> dict:
    """cf. ``fg_object.py:408-453``: mean variance/overlap overall and per
    point-count bin.  ``result_json``: {key: {variance, overlap, pointnum}}."""
    recs = list(result_json.values())
    variance = np.asarray([np.asarray(r["variance"], float) for r in recs])
    overlap = np.asarray([r["overlap"] for r in recs], float)
    pointnum = np.asarray([r["pointnum"] for r in recs], float)

    out = {
        "overall": {
            "variance": np.mean(variance, axis=0).tolist(),
            "overlap": float(np.mean(overlap)),
        },
        "partitions": {},
    }
    bin_idx = _bin_labels(pointnum, bins, labels)
    for i, lbl in enumerate(labels):
        mask = bin_idx == i
        if not mask.any():
            continue
        out["partitions"][lbl] = {
            "variance": np.mean(variance[mask], axis=0).tolist(),
            "overlap": float(np.mean(overlap[mask])),
        }
    return out


def compute_rgf(per_object_records: dict) -> dict:
    """RGF; cf. ``fg_object.py:456-500`` — the fold × MC-pass inference loop
    produces per-object uncertainty records; the metric aggregates them."""
    return compute_regression_metrics_fixed_bins(per_object_records)


# --------------------------------------------------------------------------
# RGF fold machinery — reference semantics
# (``lidargen/metrics/fg_object.py:346-500`` + GLENet eval
#  ``metrics/models/glenet/eval_utils/eval_utils.py:139-218``).
# --------------------------------------------------------------------------

def _limit_period(val, offset, period):
    return val - np.floor(val / period + offset) * period


def glenet_pass_records(apply_fn, dataset, rng, batch_size: int = 64) -> dict:
    """ONE MC eval pass over a fold's val dataset → the reference's
    ``result_{j}.pkl`` record dict {key: {pred_box, gt_box, overlap}}.

    ``apply_fn(batch_dict, rng) -> (B, 9)`` encoded box predictions (the flax
    GLENet eval path); ``dataset`` is an ``ObjectUncertaintyDataset`` val
    split.  Boxes are DECODED before dumping (the reference mutates the
    arrays in place before ``tolist()``, ``eval_utils.py:154-166,184-185``)
    and ``overlap`` is the per-pass 3D IoU of the decoded gt vs pred box
    (clamped to ±200; ``eval_utils.py:12-63``).
    """
    import jax
    import jax.numpy as jnp

    from ..datasets.object_uncertainty import decode_boxes
    from ..ops.iou3d import paired_boxes_iou3d

    out = {}
    for bi, batch in enumerate(dataset.batches(batch_size)):
        frame_ids = batch.pop("frame_id")
        bd = {k: jnp.asarray(v) for k, v in batch.items()}
        pred = np.asarray(apply_fn(bd, jax.random.fold_in(rng, bi)))
        pred_dec = decode_boxes(pred)
        gt_dec = decode_boxes(batch["gt_boxes"])
        ov = np.asarray(
            paired_boxes_iou3d(
                jnp.asarray(np.clip(gt_dec[:, :7], -200.0, 200.0)),
                jnp.asarray(np.clip(pred_dec[:, :7], -200.0, 200.0)),
            )
        )
        for i in range(len(frame_ids)):
            key = f"{frame_ids[i]}_{frame_ids[i]}"
            out[key] = {
                "pred_box": pred_dec[i].tolist(),
                "gt_box": gt_dec[i, :7].tolist(),
                "overlap": float(ov[i]),
            }
    return out


def single_fold_data(result_data_list, used_infos, val_idx):
    """Aggregate one fold's MC passes; exact mirror of ``single_fold_data``
    (``fg_object.py:346-406``): per val object, stack the per-pass decoded
    pred boxes, transform yaw by ``limit_period(yaw − gt_yaw, 0, 2π) → sin``,
    take the variance of the 7 box params across passes, and average the
    per-pass overlaps.  Returns (keys, pointnums, overlaps, variances)."""
    key_l, pointnum_l, overlap_l, variance_l = [], [], [], []
    car_info = [used_infos[idx] for idx in val_idx]
    for index in range(len(car_info)):
        info = car_info[index]
        key = f"{val_idx[index]}_{val_idx[index]}"
        if key not in result_data_list[0]:
            continue
        pred_boxes = np.array(
            [r[key]["pred_box"] for r in result_data_list]
        )  # (passes, 9)
        pred_box_overlap = [r[key]["overlap"] for r in result_data_list]
        gt_box_angle = result_data_list[0][key]["gt_box"][6]
        pred_boxes[:, 6] = _limit_period(
            pred_boxes[:, 6] - gt_box_angle, 0, 2 * np.pi
        )
        pred_boxes[:, 6] = np.sin(pred_boxes[:, 6])
        key_l.append(key)
        pointnum_l.append(info["num_points_in_gt"])
        variance_l.append(np.var(pred_boxes[:, :7], axis=0))
        overlap_l.append(np.mean(pred_box_overlap))
    return key_l, pointnum_l, overlap_l, variance_l


def compute_rgf_folds(infos, build_fold_apply, rng, num_passes: int = 30,
                      num_folds: int = 10, batch_size: int = 64,
                      text_feat=None, point_dims: int = 4) -> dict:
    """Full RGF driver with the reference's 10-fold × 30-pass structure
    (``compute_rgf``, ``fg_object.py:456-500``).

    ``infos``: foreground info dict or flat list (filtered to
    ['car','truck','bus']); ``build_fold_apply(fold_idx) -> apply_fn`` returns
    the (fold-trained) GLENet eval apply for that fold.  ``text_feat=None``
    falls back to a zero CLIP table (same default ``tools/evaluate_our.py``
    uses when no cache is given).  Returns the metric dict from
    ``compute_regression_metrics_fixed_bins``."""
    import jax

    from ..datasets.object_uncertainty import (
        CLASS_NAMES,
        ObjectUncertaintyDataset,
        flatten_uncertainty_infos,
        kfold_val_indices,
    )

    if text_feat is None:
        text_feat = {c: np.zeros((1, 512), np.float32) for c in CLASS_NAMES}

    used_infos = flatten_uncertainty_infos(infos)
    folds = kfold_val_indices(len(used_infos))
    result_json = {}
    for fold_idx in range(num_folds):
        apply_fn = build_fold_apply(fold_idx)
        # seeded per fold: the 512-point resample in each MC pass must not
        # ride the global np.random stream, or RGF becomes nondeterministic
        ds = ObjectUncertaintyDataset(
            used_infos, fold_idx, text_feat, training=False,
            point_dims=point_dims, rng=np.random.RandomState(1000 + fold_idx),
        )
        passes = [
            glenet_pass_records(
                apply_fn, ds,
                jax.random.fold_in(jax.random.fold_in(rng, fold_idx), j),
                batch_size,
            )
            for j in range(num_passes)
        ]
        key_l, pointnum_l, overlap_l, variance_l = single_fold_data(
            passes, used_infos, folds[fold_idx]
        )
        for i in range(len(key_l)):
            result_json[key_l[i]] = {
                "variance": variance_l[i],
                "overlap": overlap_l[i],
                "pointnum": pointnum_l[i],
            }
    return compute_regression_metrics_fixed_bins(result_json)


def compute_dcf(detection_results: dict, keep_classes=("car", "truck", "bus", "pedestrian")) -> dict:
    """DCF (mean detector confidence); cf. ``fg_object.py:502-531``.

    ``detection_results``: {class_name: [{name, score, box3d_lidar}, ...]}.
    """
    class_scores = defaultdict(list)
    for class_name, objs in detection_results.items():
        if class_name in keep_classes:
            for det in objs:
                class_scores[det["name"]].append(det["score"])
    return {
        cls: float(round(float(np.mean(scores)), 4))
        for cls, scores in class_scores.items()
    }
