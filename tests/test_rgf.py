"""RGF at reference semantics: KFold(10, shuffle, 42) parity, the
single_fold_data mirror (``lidargen/metrics/fg_object.py:346-406``), GLENet
pass records (decode + per-pass pred-vs-GT IoU,
``glenet/eval_utils/eval_utils.py:139-218``), and the fold-trainer CLI
end-to-end."""

import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from lidarcrafter_tpu.datasets.object_uncertainty import (
    CLASS_NAMES,
    ObjectUncertaintyDataset,
    POINT_ANCHOR_SIZE,
    decode_boxes,
    encode_gt_box,
    flatten_uncertainty_infos,
    kfold_val_indices,
)
from lidarcrafter_tpu.metrics.fg_object import (
    compute_rgf_folds,
    glenet_pass_records,
    single_fold_data,
)

REPO = Path(__file__).resolve().parent.parent


def make_infos(n, seed=0, num_pts=64):
    rng = np.random.RandomState(seed)
    names = ["car", "truck", "bus", "pedestrian"]  # ped must be filtered out
    return [
        {
            "name": names[i % 4],
            "num_points_in_gt": int(rng.randint(10, 500)),
            "box3d_lidar": np.array(
                [*(rng.randn(3) * 2), 4.2, 1.9, 1.7, rng.uniform(-3, 3)],
                np.float32,
            ),
            "points": (rng.randn(num_pts, 4) * 0.8).astype(np.float32),
        }
        for i in range(n)
    ]


TEXT_FEAT = {c: np.full((1, 512), 0.1, np.float32) for c in CLASS_NAMES}


def test_kfold_matches_sklearn():
    from sklearn.model_selection import KFold

    for n in (23, 100, 7 * 10):
        ours = kfold_val_indices(n, 10, 42)
        ref = [
            val
            for _, val in KFold(n_splits=10, shuffle=True,
                                random_state=42).split(np.arange(n))
        ]
        for a, b in zip(ours, ref):
            np.testing.assert_array_equal(a, b)


def test_flatten_infos_filters_classes():
    infos = make_infos(12)
    flat = flatten_uncertainty_infos(infos)
    assert all(x["name"] in ("car", "truck", "bus") for x in flat)
    assert len(flat) == 9
    # dict form flattens in dict order
    d = {"car": infos[:2], "pedestrian": infos[2:4], "bus": infos[4:6]}
    flat_d = flatten_uncertainty_infos(d)
    assert len(flat_d) == 4 and flat_d[0] is infos[0] and flat_d[2] is infos[4]


def test_encode_decode_roundtrip():
    box = np.array([1.0, -2.0, 0.5, 4.5, 1.9, 1.8, 0.7], np.float32)
    enc = encode_gt_box(box, 1.0, -2.0, 0.5)
    dec = decode_boxes(enc[None])[0]
    # the reference target drops the box center: it encodes (−point_mean)
    # (crops are box-centered), so decode restores −mean; sizes restored
    np.testing.assert_allclose(dec[:3], [-1.0, 2.0, -0.5], atol=1e-6)
    np.testing.assert_allclose(dec[3:6], box[3:6], rtol=1e-6)
    assert dec[6] == pytest.approx(0.7)


def test_dataset_eval_item_matches_reference_math():
    infos = make_infos(30, seed=3)
    ds = ObjectUncertaintyDataset(
        infos, fold_idx=0, text_feat=TEXT_FEAT, training=False,
        rng=np.random.RandomState(0),
    )
    flat = flatten_uncertainty_infos(infos)
    val_idx = kfold_val_indices(len(flat))[0]
    assert len(ds) == len(val_idx)
    item = ds[0]
    info = flat[val_idx[0]]
    assert item["frame_id"] == val_idx[0]
    assert item["points"].shape == (512, 3)
    # hand-computed reference math (object_uncertainty_dataset.py:133-198)
    pts = np.asarray(info["points"], np.float32)[:, :3]
    mean = pts.mean(0)
    dxa, dya, dza = POINT_ANCHOR_SIZE
    diag = np.sqrt(dxa**2 + dya**2)
    box = np.asarray(info["box3d_lidar"], np.float64)
    exp7 = np.array([
        -mean[0] / diag, -mean[1] / diag, -mean[2] / dza,
        np.log(box[3] / dxa), np.log(box[4] / dya), np.log(box[5] / dza),
        box[6],
    ])
    np.testing.assert_allclose(item["gt_boxes"], exp7, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        item["gt_boxes_input"],
        np.concatenate([exp7[:6], [np.sin(box[6]), np.cos(box[6])]]),
        rtol=1e-5, atol=1e-6,
    )
    # normalized points stay within the normalized extent of the raw cloud
    assert abs(item["points"][:, 0].max() - (pts[:, 0].max() - mean[0]) / diag) < 1e-5


def test_single_fold_data_mirror_golden():
    """Hand-built mirror of the reference ``single_fold_data`` on synthetic
    per-pass records must match our driver EXACTLY (fold structure, key
    format, limit_period(yaw−gt_yaw)→sin, per-pass overlap mean)."""
    rng = np.random.RandomState(7)
    infos = make_infos(25, seed=7)
    used = flatten_uncertainty_infos(infos)
    val_idx = kfold_val_indices(len(used))[2]
    passes = []
    for _ in range(4):  # 4 MC passes
        rec = {}
        for idx in val_idx:
            rec[f"{idx}_{idx}"] = {
                "pred_box": rng.randn(9).tolist(),
                "gt_box": rng.randn(7).tolist(),
                "overlap": float(rng.rand()),
            }
        passes.append(rec)
    # pin gt_box across passes like the reference pkl (gt is deterministic)
    for idx in val_idx:
        g = passes[0][f"{idx}_{idx}"]["gt_box"]
        for p in passes[1:]:
            p[f"{idx}_{idx}"]["gt_box"] = list(g)

    keys, pointnums, overlaps, variances = single_fold_data(
        passes, used, val_idx
    )

    # literal reference mirror (fg_object.py:380-406)
    exp_keys, exp_pn, exp_ov, exp_var = [], [], [], []
    car_info = [used[i] for i in val_idx]
    for index in range(len(car_info)):
        key = f"{val_idx[index]}_{val_idx[index]}"
        pred_boxes = np.array([r[key]["pred_box"] for r in passes])
        gt_angle = passes[0][key]["gt_box"][6]
        v = pred_boxes[:, 6] - gt_angle
        v = v - np.floor(v / (2 * np.pi)) * (2 * np.pi)
        pred_boxes[:, 6] = np.sin(v)
        exp_keys.append(key)
        exp_pn.append(car_info[index]["num_points_in_gt"])
        exp_var.append(np.var(pred_boxes[:, :7], axis=0))
        exp_ov.append(np.mean([r[key]["overlap"] for r in passes]))

    assert keys == exp_keys and pointnums == exp_pn
    np.testing.assert_array_equal(np.asarray(overlaps), np.asarray(exp_ov))
    np.testing.assert_array_equal(np.asarray(variances), np.asarray(exp_var))


def test_glenet_pass_records_identity_prediction():
    """A stub net that returns the encoded GT box must score overlap ≈ 1 and
    dump the DECODED boxes (the reference decodes in place before tolist)."""
    import jax.numpy as jnp

    infos = make_infos(20, seed=1)
    ds = ObjectUncertaintyDataset(
        infos, fold_idx=0, text_feat=TEXT_FEAT, training=False,
        rng=np.random.RandomState(0),
    )
    import jax

    def apply_fn(bd, rng):
        gt = bd["gt_boxes"]
        return jnp.concatenate([gt, jnp.zeros((gt.shape[0], 2))], axis=1)

    recs = glenet_pass_records(apply_fn, ds, jax.random.PRNGKey(0), 8)
    assert len(recs) == len(ds)
    for key, r in recs.items():
        a, b = key.split("_")
        assert a == b
        assert r["overlap"] == pytest.approx(1.0, abs=1e-4)
        np.testing.assert_allclose(
            np.asarray(r["pred_box"])[:7], np.asarray(r["gt_box"]), atol=1e-5
        )
        # centers are mean-relative × diagonal — decoded, not raw-encoded
        assert abs(np.asarray(r["gt_box"])[3]) > 1.0  # real metric size


def test_rgf_end_to_end_with_fold_trainer(tmp_path):
    """Train 2 folds a few steps via tools/train_glenet.py → MC eval →
    RGF JSON (VERDICT round-3 task 5 done-criterion)."""
    import jax

    infos = make_infos(40, seed=5)
    info_pkl = tmp_path / "fg_info.pkl"
    with open(info_pkl, "wb") as f:
        pickle.dump(infos, f)
    tf_pkl = tmp_path / "text_feat.pkl"
    with open(tf_pkl, "wb") as f:
        pickle.dump(TEXT_FEAT, f)

    out = tmp_path / "folds"
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "train_glenet.py"),
         "--fg-info", str(info_pkl), "--text-feat", str(tf_pkl),
         "--folds", "0,1", "--epochs", "2", "--steps-per-epoch", "2",
         "--batch-size", "4", "--lr", "1e-4", "-o", str(out)],
        capture_output=True, text=True, timeout=1200,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert (out / "fold_0.pkl").exists() and (out / "fold_1.pkl").exists()

    from lidarcrafter_tpu.metrics.models.glenet import load_glenet_fold

    def build_fold_apply(fold_idx):
        model, variables = load_glenet_fold(out / f"fold_{fold_idx}.pkl")
        return jax.jit(lambda bd, rng: model.apply(variables, bd, rng=rng))

    metrics = compute_rgf_folds(
        infos, build_fold_apply, jax.random.PRNGKey(0),
        num_passes=3, num_folds=2, batch_size=8, text_feat=TEXT_FEAT,
    )
    assert set(metrics) == {"overall", "partitions"}
    assert len(metrics["overall"]["variance"]) == 7
    assert 0.0 <= metrics["overall"]["overlap"] <= 1.0
    # 2 folds over 30 kept crops → ~6 objects contributed
    assert metrics["partitions"]


def test_compute_rgf_folds_default_text_feat():
    """``text_feat=None`` must fall back to a zero CLIP table instead of
    crashing in the dataset (round-4 review regression)."""
    import jax
    import jax.numpy as jnp

    from lidarcrafter_tpu.metrics.models.glenet import EXP20_KWARGS, GLENet

    model = GLENet(**EXP20_KWARGS)
    batch0 = {
        "points": jnp.zeros((1, 512, 3)),
        "text_feat": jnp.zeros((1, 512)),
        "gt_boxes_input": jnp.zeros((1, 8)),
        "gt_boxes": jnp.zeros((1, 7)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch0,
        rng=jax.random.PRNGKey(1), train=True,
    )
    apply_fn = jax.jit(lambda bd, rng: model.apply(variables, bd, rng=rng))

    metrics = compute_rgf_folds(
        make_infos(24, seed=9), lambda fold: apply_fn, jax.random.PRNGKey(0),
        num_passes=2, num_folds=2, batch_size=8,  # text_feat omitted
    )
    assert set(metrics) == {"overall", "partitions"}
    assert len(metrics["overall"]["variance"]) == 7
