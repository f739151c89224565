"""Detection evaluation: pcdet-style recall + nuScenes-protocol AP.

Golden values are computed by hand from the published protocol
(devkit ``detection/algo.py`` accumulate/calc_ap semantics;
``pcdet_eval_utils.eval_one_epoch:85-120`` recall semantics).
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from lidarcrafter_tpu.metrics.detection_eval import (
    _accumulate_class,
    box_recall_counts,
    calc_ap,
    evaluate_detections,
)


def box(x, y, z=0.0, dx=4.0, dy=2.0, dz=1.5, yaw=0.0):
    return [x, y, z, dx, dy, dz, yaw]


# ------------------------------------------------------------------- calc_ap


def test_calc_ap_perfect_detector():
    # 10 GT, 10 TP predictions in score order → precision 1 at every recall.
    # interp precision = 1 on the whole grid; after slicing recall > 0.1 and
    # subtracting min_precision: (1 - 0.1) / (1 - 0.1) = 1.
    tp = np.ones(10, bool)
    assert calc_ap(tp, n_gt=10) == pytest.approx(1.0)


def test_calc_ap_all_false():
    assert calc_ap(np.zeros(5, bool), n_gt=5) == 0.0
    assert calc_ap(np.ones(0, bool), n_gt=0) == 0.0


def test_calc_ap_half_recall_hand_computed():
    # 5 TP then 5 FP over 10 GT: precision stays 1 up to recall 0.5, then
    # falls.  Interpolated precision on the 101-pt grid: 1.0 for recall grid
    # points <= 0.5 that are covered (np.interp with right=0 → 0 past max
    # recall).  Hand-compute the exact expectation with the same formula.
    tp = np.array([1, 1, 1, 1, 1, 0, 0, 0, 0, 0], bool)
    tps = np.cumsum(tp)
    fps = np.cumsum(~tp)
    prec = tps / (tps + fps)
    rec = tps / 10.0
    grid = np.linspace(0, 1, 101)
    pi = np.interp(grid, rec, prec, right=0.0)[11:]
    expected = np.maximum(pi - 0.1, 0).mean() / 0.9
    assert calc_ap(tp, n_gt=10) == pytest.approx(expected)
    assert 0.0 < expected < 0.5


# -------------------------------------------------------- greedy matching


def _annos(det_boxes, det_scores, det_names, gt_boxes, gt_names):
    det = [{"boxes_lidar": np.asarray(b, np.float32).reshape(-1, 7),
            "score": np.asarray(s, np.float32),
            "name": np.asarray(n)} for b, s, n in
           zip(det_boxes, det_scores, det_names)]
    gt = [{"gt_boxes": np.asarray(b, np.float32).reshape(-1, 7),
           "name": np.asarray(n)} for b, n in zip(gt_boxes, gt_names)]
    return det, gt


def test_greedy_match_duplicates_one_tp():
    # two detections on one GT: highest score matches (TP), second is FP —
    # the devkit's "each GT matched at most once".
    det, gt = _annos(
        det_boxes=[[box(0, 0), box(0.3, 0)]],
        det_scores=[[0.9, 0.8]],
        det_names=[["car", "car"]],
        gt_boxes=[[box(0, 0)]],
        gt_names=[["car"]],
    )
    scores, tp, n_gt = _accumulate_class(det, gt, "car", dist_th=2.0)
    assert n_gt == 1
    assert list(tp) == [True, False]
    assert scores[0] >= scores[1]


def test_greedy_match_cross_sample_isolation():
    # a detection in sample 0 cannot match a GT in sample 1
    det, gt = _annos(
        det_boxes=[[box(0, 0)], np.zeros((0, 7))],
        det_scores=[[0.9], []],
        det_names=[["car"], []],
        gt_boxes=[np.zeros((0, 7)), [box(0, 0)]],
        gt_names=[[], ["car"]],
    )
    _, tp, n_gt = _accumulate_class(det, gt, "car", dist_th=2.0)
    assert n_gt == 1 and list(tp) == [False]


def test_greedy_match_class_filter_and_distance():
    det, gt = _annos(
        det_boxes=[[box(0, 0), box(10, 0)]],
        det_scores=[[0.9, 0.8]],
        det_names=[["car", "pedestrian"]],
        gt_boxes=[[box(0.4, 0.0), box(10, 3)]],
        gt_names=[["car", "pedestrian"]],
    )
    _, tp_car, _ = _accumulate_class(det, gt, "car", dist_th=0.5)
    assert list(tp_car) == [True]
    # pedestrian det is 3 m from its GT: TP at 4.0 threshold, FP at 2.0
    _, tp_p2, _ = _accumulate_class(det, gt, "pedestrian", dist_th=2.0)
    _, tp_p4, _ = _accumulate_class(det, gt, "pedestrian", dist_th=4.0)
    assert list(tp_p2) == [False] and list(tp_p4) == [True]


# --------------------------------------------------------------- box recall


def test_box_recall_rotated_iou():
    gt = np.array([box(0, 0), box(20, 0)], np.float32)
    # det 1: exact match of gt 0 → IoU 1; det 2: half-overlap shift of gt 1
    det = np.array([box(0, 0), box(20 + 2.0, 0)], np.float32)
    c = box_recall_counts(det, gt)
    assert c["gt_num"] == 2
    assert c["recall_rcnn_0.7"] == 1  # only the exact match
    assert c["recall_rcnn_0.3"] == 2  # the 1/3-IoU shifted det counts
    # empty dets → zero recall, gt_num preserved
    c0 = box_recall_counts(np.zeros((0, 7), np.float32), gt)
    assert c0["gt_num"] == 2 and c0["recall_rcnn_0.3"] == 0


def test_box_recall_flat_single_box():
    """A single unbatched (7,)/(9,) box must be read as ONE box, not as 7
    one-column boxes (round-4 review regression)."""
    b = np.asarray(box(0, 0), np.float32)  # flat (7,)
    c = box_recall_counts(b, b)
    assert c["gt_num"] == 1 and c["recall_rcnn_0.7"] == 1
    c9 = box_recall_counts(np.concatenate([b, [9.9, 9.9]]), b)
    assert c9["gt_num"] == 1 and c9["recall_rcnn_0.7"] == 1


def test_box_recall_nine_dim_boxes():
    """Converter boxes carry (…, vx, vy) velocity columns; recall must read
    only the 7 geometry columns instead of raising a broadcast error (advisor
    finding, round 3)."""
    gt7 = np.array([box(0, 0), box(20, 0)], np.float32)
    det7 = np.array([box(0, 0), box(22.0, 0)], np.float32)
    vel = np.full((2, 2), 9.9, np.float32)  # junk velocity columns
    c9 = box_recall_counts(np.hstack([det7, vel]), np.hstack([gt7, vel]))
    c7 = box_recall_counts(det7, gt7)
    assert c9 == c7
    # and through the full driver with mismatched widths (9-dim det, 7-dim gt)
    det_annos = [{"boxes_lidar": np.hstack([det7, vel]),
                  "score": np.array([0.9, 0.8]),
                  "name": np.array(["car", "car"])}]
    gt_annos = [{"gt_boxes": gt7, "name": np.array(["car", "car"])}]
    res = evaluate_detections(det_annos, gt_annos, ["car"])
    assert res["gt_num"] == 2 and res["recall/rcnn_0.3"] == 1.0


def test_load_gt_infos_and_match_token(tmp_path):
    import pickle

    from lidarcrafter_tpu.metrics.detection_eval import load_gt_infos, match_token

    infos = {"infos": [  # the converter's {"infos": [...]} wrapper form
        {"token": "abc123", "gt_boxes": np.zeros((2, 9)),
         "gt_names": np.array(["car", "bus"])},
        {"sample_token": "def456", "gt_boxes": np.zeros((0, 7)),
         "names": np.array([])},
    ]}
    p = tmp_path / "infos.pkl"
    with open(p, "wb") as f:
        pickle.dump(infos, f)
    gt = load_gt_infos(p)
    assert set(gt) == {"abc123", "def456"}
    # 9-dim converter boxes (…, vx, vy) are trimmed to 7
    assert gt["abc123"]["gt_boxes"].shape == (2, 7)
    assert gt["def456"]["gt_boxes"].shape == (0, 7)

    tokens = set(gt)
    assert match_token("sample_00042_abc123", tokens) == "abc123"  # last chunk
    assert match_token("abc123.npy", tokens) == "abc123"
    assert match_token("def456", tokens) == "def456"  # full-stem fallback
    assert match_token("nope", tokens) is None


def test_box_recall_padding_invariant():
    """Shape bucketing (zero-size pad boxes) must not change the tallies:
    padded boxes have volume 0 → IoU 0 vs everything, and padded GT rows are
    sliced off before thresholding."""
    from lidarcrafter_tpu.metrics.detection_eval import _pad_boxes

    rng = np.random.RandomState(3)
    gt = np.array([box(0, 0), box(20, 0), box(-15, 7, yaw=0.4)], np.float32)
    det = np.array(
        [box(0.2, 0.1), box(20 + 1.0, 0), box(40, 40)] + [box(*c) for c in
         rng.uniform(-30, 30, (5, 2))], np.float32
    )
    c = box_recall_counts(det, gt)  # det N=8, gt M=3 → padded to 32 each
    assert _pad_boxes(det).shape == (32, 7) and _pad_boxes(gt).shape == (32, 7)
    assert _pad_boxes(np.zeros((32, 7), np.float32)).shape == (32, 7)
    assert _pad_boxes(np.zeros((33, 7), np.float32)).shape == (64, 7)
    # hand-check: det0 nearly covers gt0 (IoU > 0.5), det1 overlaps gt1 at
    # ~0.6 center shift... compute exact via the unpadded IoU op
    from lidarcrafter_tpu.ops.iou3d import boxes_iou3d
    import jax.numpy as jnp

    iou = np.asarray(boxes_iou3d(jnp.asarray(det), jnp.asarray(gt)))
    best = iou.max(axis=0)
    for t in (0.3, 0.5, 0.7):
        assert c[f"recall_rcnn_{t}"] == int((best >= t).sum())
    assert c["gt_num"] == 3


# ------------------------------------------------------------- end-to-end


def test_evaluate_detections_keys_and_perfect_map():
    det, gt = _annos(
        det_boxes=[[box(0, 0), box(10, 5)]],
        det_scores=[[0.9, 0.8]],
        det_names=[["car", "pedestrian"]],
        gt_boxes=[[box(0, 0), box(10, 5)]],
        gt_names=[["car", "pedestrian"]],
    )
    res = evaluate_detections(det, gt, ["car", "pedestrian"])
    assert res["gt_num"] == 2
    assert res["recall/rcnn_0.7"] == pytest.approx(1.0)
    assert res["mAP"] == pytest.approx(1.0)
    assert res["ap"]["car"]["dist_0.5"] == pytest.approx(1.0)
    assert res["avg_pred_objects"] == pytest.approx(2.0)


def test_extract_foreground_gt_mode(tmp_path):
    """GT-box extraction path (the 'ori' control arm / opendwm cross-method
    path, cf. extract_opendwm_foreground_points.py): no detector, boxes from
    the info pkl, >=min-points crops centered at their boxes."""
    import pickle

    gen = tmp_path / "gen"
    gen.mkdir()
    rng = np.random.RandomState(1)
    # 100 points inside a box at (5, 5), the rest far away
    inside = np.concatenate(
        [rng.uniform(-1, 1, (100, 2)) * [1.5, 0.8] + [5, 5],
         rng.uniform(-0.5, 0.5, (100, 1)), rng.rand(100, 1)], axis=1,
    )
    outside = np.concatenate(
        [rng.uniform(20, 40, (200, 3)), rng.rand(200, 1)], axis=1
    )
    np.save(gen / "tokA.npy",
            np.concatenate([inside, outside]).astype(np.float32))
    infos = [{"token": "tokA",
              "gt_boxes": np.array([box(5, 5, dx=4, dy=2, dz=2),
                                    box(30, -30)], np.float32),
              "gt_names": np.array(["car", "pedestrian"])}]
    gt_pkl = tmp_path / "infos.pkl"
    with open(gt_pkl, "wb") as f:
        pickle.dump(infos, f)
    out = tmp_path / "res"
    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "tools/extract_foreground.py"),
         "--gen-dir", str(gen), "-o", str(out), "--gt-infos", str(gt_pkl),
         "--max-points", "512", "--min-points", "50"],
        capture_output=True, text=True, timeout=560,
        env={"PYTHONPATH": str(repo), "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": str(tmp_path)},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out / "foreground_samples_info.pkl", "rb") as f:
        info = pickle.load(f)
    # car box has 100 points (>= 50) → kept; pedestrian not in the default
    # keep set (car/truck/bus) → absent
    assert set(info) == {"car"} and len(info["car"]) == 1
    crop = np.fromfile(info["car"][0]["path"], np.float32).reshape(-1, 4)
    assert info["car"][0]["num_points_in_gt"] == len(crop) == 100
    # crops are box-centered
    assert np.abs(crop[:, :2]).max() < 2.5


def test_evaluate_detection_cli_smoke(tmp_path):
    """End-to-end: synthetic cloud + random-weight detector → JSON with all
    keys (mirrors evaluate_3d_detection.py's driver role)."""
    import pickle

    gen = tmp_path / "gen"
    gen.mkdir()
    rng = np.random.RandomState(0)
    cloud = rng.randn(2048, 4).astype(np.float32) * 10
    np.save(gen / "sample_tok0.npy", cloud)
    infos = [{"token": "tok0",
              "gt_boxes": np.array([box(5, 5)], np.float32),
              "gt_names": np.array(["car"])}]
    gt_pkl = tmp_path / "infos.pkl"
    with open(gt_pkl, "wb") as f:
        pickle.dump(infos, f)
    out = tmp_path / "res"
    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "tools/evaluate_detection.py"),
         "--gen-dir", str(gen), "--gt-infos", str(gt_pkl),
         "-o", str(out), "--random-params", "--max-points", "2048"],
        capture_output=True, text=True, timeout=560,
        env={"PYTHONPATH": str(repo), "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": str(tmp_path)},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    res = json.loads((out / "detection_eval.json").read_text())
    for key in ("mAP", "ap", "gt_num", "recall/rcnn_0.3", "avg_pred_objects"):
        assert key in res
    assert (out / "result_vxrcnn.pkl").exists()


def test_evaluate_detections_flat_single_box():
    """A flat (7,) single-box anno through the FULL driver must count as one
    box — the pre-reshape at the call site used to mangle it into 7
    one-column rows (round-4 review regression)."""
    b = np.asarray(box(0, 0), np.float32)  # flat (7,)
    det_annos = [{"boxes_lidar": b, "score": np.array([0.9]),
                  "name": np.array(["car"])}]
    gt_annos = [{"gt_boxes": b, "name": np.array(["car"])}]
    res = evaluate_detections(det_annos, gt_annos, ["car"])
    assert res["gt_num"] == 1
    assert res["recall/rcnn_0.7"] == 1.0
