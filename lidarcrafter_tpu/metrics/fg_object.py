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
