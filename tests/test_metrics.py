"""Metrics suite: Fréchet/MMD parity vs reference numpy, JSD/MMD-2D parity,
ICP recovery, TCD, eval orchestration."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lidarcrafter_tpu.metrics import bev as bev_metrics
from lidarcrafter_tpu.metrics import evaluate
from lidarcrafter_tpu.metrics.distribution import (
    compute_frechet_distance,
    compute_squared_mmd,
)
from lidarcrafter_tpu.metrics.temporal import (
    icp_point_to_point,
    relative_gt_transform,
    sequence_tcd,
)
from tests.reference_loader import REF, _load

ref_dist = _load(REF / "lidargen/metrics/distribution.py", "ref_distribution")
ref_bev = _load(REF / "lidargen/metrics/bev.py", "ref_bev")


def test_frechet_distance_parity():
    rng = np.random.RandomState(0)
    f1 = rng.randn(500, 16).astype(np.float64)
    f2 = (rng.randn(400, 16) * 1.5 + 0.3).astype(np.float64)
    want = ref_dist.compute_frechet_distance(f1, f2)
    got = compute_frechet_distance(f1, f2)
    np.testing.assert_allclose(got, want, rtol=2e-3)
    # identical sets → ~0
    assert abs(compute_frechet_distance(f1, f1)) < 1e-3


def test_squared_mmd_sane():
    rng = np.random.RandomState(1)
    f1 = rng.randn(300, 8).astype(np.float64)
    f2 = rng.randn(300, 8).astype(np.float64) + 2.0
    same = compute_squared_mmd(f1, f1, num_subsets=20)
    diff = compute_squared_mmd(f1, f2, num_subsets=20)
    assert diff > same
    assert abs(same) < 0.5


def test_jsd_mmd_2d_parity():
    rng = np.random.RandomState(2)
    h1 = rng.rand(6, 10, 10).astype(np.float32)
    h2 = rng.rand(6, 10, 10).astype(np.float32)
    want_jsd = ref_bev.compute_jsd_2d(torch.from_numpy(h1), torch.from_numpy(h2))
    got_jsd = bev_metrics.compute_jsd_2d(jnp.asarray(h1), jnp.asarray(h2))
    np.testing.assert_allclose(got_jsd, want_jsd, rtol=1e-3, atol=1e-5)

    want_mmd = ref_bev.compute_mmd_2d(torch.from_numpy(h1), torch.from_numpy(h2))
    got_mmd = bev_metrics.compute_mmd_2d(jnp.asarray(h1), jnp.asarray(h2))
    np.testing.assert_allclose(got_mmd, want_mmd, rtol=1e-3, atol=1e-6)


def test_bev_occupancy_grid():
    pts = np.array([[0.1, 0.1, 0], [0.2, 0.2, 0], [5.0, 5.0, 0], [100, 100, 0]], np.float32)
    grid = np.asarray(bev_metrics.bev_occupancy_grid(jnp.asarray(pts), data_type="32"))
    # two points share voxel (0.1,0.1)&(0.2,0.2)→ same 0.5m voxel → one count
    assert grid.sum() == 2.0  # out-of-range point dropped


def test_icp_recovers_known_transform():
    rng = np.random.RandomState(3)
    src = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    theta = 0.05
    R_true = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]],
        np.float32,
    )
    t_true = np.array([0.5, -0.3, 0.1], np.float32)
    tgt = src @ R_true.T + t_true
    R, t = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt), threshold=2.0, iters=30)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)


def test_relative_gt_transform_identity():
    info = {
        "lidar2ego_rotation": [1.0, 0, 0, 0],
        "lidar2ego_translation": [0.9, 0, 1.8],
        "ego2global_rotation": [1.0, 0, 0, 0],
        "ego2global_translation": [100.0, 50.0, 0.0],
    }
    R, T = relative_gt_transform(info, info)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(T, 0, atol=1e-9)

    # pure ego translation by +10m in x → transform moves source points by -10
    info2 = dict(info, ego2global_translation=[110.0, 50.0, 0.0])
    R, T = relative_gt_transform(info, info2)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(T, [-10.0, 0.0, 0.0], atol=1e-9)


def test_sequence_tcd():
    rng = np.random.RandomState(4)
    base = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    frames = [base + 0.01 * i for i in range(4)]
    out = sequence_tcd(frames, splits=(1, 2))
    assert len(out[1]) == 3 and len(out[2]) == 2
    assert all(v >= 0 for v in out[1])
    # split-2 pairs are farther apart → larger TCD
    assert np.mean(out[2]) > np.mean(out[1])


def test_evaluate_orchestration():
    rng = np.random.RandomState(5)
    ref = [rng.uniform(-20, 20, (300, 3)).astype(np.float32) for _ in range(3)]
    gen = [r + rng.randn(300, 3).astype(np.float32) * 0.1 for r in ref]
    res = evaluate(ref, gen, metrics=["cd", "jsd", "mmd"], data="32", verbose=False)
    assert set(res) == {"cd", "jsd", "mmd"}
    assert all(np.isfinite(v) for v in res.values())
    feats = (rng.randn(100, 8), rng.randn(100, 8))
    res = evaluate(ref, gen, metrics=["frid"], features={"range": feats}, verbose=False)
    assert np.isfinite(res["frid"])
    with pytest.raises(ValueError):
        evaluate(ref, gen, metrics=["fsvd"], verbose=False)


def test_evaluation_engine_end_to_end(tmp_path):
    """EvaluationEngine with real flax extractors (random weights) + caching."""
    import jax

    from lidarcrafter_tpu.metrics.engine import EvaluationEngine
    from lidarcrafter_tpu.metrics.extractor.pointnet import PointNetFeatureExtractor
    from lidarcrafter_tpu.metrics.extractor.rangenet import RangeNet
    from lidarcrafter_tpu.utils.lidar import LiDARUtility

    utils = LiDARUtility.create((16, 64), "log_depth", 1.45, 80.0)
    rnet = RangeNet(num_classes=5, in_ch=5, backbone=21)
    rparams = rnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 5)))
    pnet = PointNetFeatureExtractor(k=4)
    pparams = pnet.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 3)))

    engine = EvaluationEngine(
        lidar_utils=utils,
        rangenet_apply=lambda img: rnet.apply(rparams, img, feature="lidargen"),
        pointnet_apply=lambda pts: pnet.apply(pparams, pts),
        cache_dir=str(tmp_path),
        num_points_pointnet=64,
    )
    rng = np.random.RandomState(0)

    def cloud():
        r = rng.uniform(3, 50, 500)
        az = rng.uniform(-np.pi, np.pi, 500)
        el = rng.uniform(-0.4, 0.15, 500)
        return np.stack(
            [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az),
             r * np.sin(el), rng.rand(500)], 1,
        ).astype(np.float32)

    real = [cloud() for _ in range(3)]
    gen = [cloud() for _ in range(3)]
    res = engine.evaluate(
        real, gen, metrics=("frd", "fpd", "jsd", "mmd"),
        output_json=str(tmp_path / "out.json"),
    )
    assert set(res) >= {"frd", "fpd", "jsd", "mmd"}
    assert all(np.isfinite(v) for v in res.values())
    assert (tmp_path / "features_real.pkl").exists()
    assert (tmp_path / "out.json").exists()
    # cached second run gives identical features
    res2 = engine.evaluate(real, gen, metrics=("jsd",))
    np.testing.assert_allclose(res2["jsd"], res["jsd"], rtol=1e-6)
