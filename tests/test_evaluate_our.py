"""End-to-end test of the unified evaluation CLI (tools/evaluate_our.py):
one invocation over synthetic data must produce the reference's nested JSON
(``evaluate_our.py:322-443``): bev/scene/object/obj sections."""

import importlib.util
import json
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _load_cli():
    spec = importlib.util.spec_from_file_location(
        "evaluate_our_cli", REPO / "tools" / "evaluate_our.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_cloud(r, n=2048):
    pts = np.concatenate(
        [r.rand(n, 2) * 60 - 30, r.rand(n, 1) * 4 - 2, r.rand(n, 1)], axis=1
    ).astype(np.float32)
    return pts


def _make_fg_info(root: Path, r, classes=("car", "pedestrian"), per_class=3):
    (root / "foreground_samples").mkdir(parents=True, exist_ok=True)
    info = {}
    for cls in classes:
        recs = []
        for i in range(per_class):
            crop = (r.rand(200, 4).astype(np.float32) - 0.5) * 2
            path = root / "foreground_samples" / f"{cls}_{i}.bin"
            crop.tofile(path)
            recs.append({
                "name": cls,
                "path": str(path),
                "num_points_in_gt": 200,
                "box3d_lidar": [0, 0, 0, 4.0, 2.0, 1.5, 0.1],
                "score": 0.5 + 0.1 * i,
            })
        info[cls] = recs
    with open(root / "foreground_samples_info.pkl", "wb") as f:
        pickle.dump(info, f)


def test_evaluate_our_all_sections(tmp_path, monkeypatch):
    r = np.random.RandomState(0)
    sample_dir = tmp_path / "generated_results"
    real_dir = tmp_path / "real"
    real_dir.mkdir()
    (sample_dir / "our").mkdir(parents=True)
    for i in range(4):
        np.save(real_dir / f"r{i}.npy", _make_cloud(r))
        np.save(sample_dir / "our" / f"g{i}.npy", _make_cloud(r))
    _make_fg_info(sample_dir / "our" / "inference_results", r)
    _make_fg_info(sample_dir / "ori" / "inference_results", r)

    out = tmp_path / "results.json"
    argv = [
        "evaluate_our.py",
        "--method", "our",
        "--sample-dir", str(sample_dir),
        "--real-dir", str(real_dir),
        "-m", "jsd", "mmd", "cd", "dcf", "cgf", "rgf", "obj",
        "--random-extractors",
        "--num-obj-points", "128",
        "--mc-passes", "2",
        "--batch-size", "8",
        "-o", str(out),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    _load_cli().main()

    results = json.loads(out.read_text())
    assert set(results["bev"]) == {"jsd", "mmd"}
    assert "cd" in results["scene"]
    # dcf: mean confidence per class from the info pkl
    assert results["object"]["dcf"]["car"] == pytest.approx(0.6, abs=1e-4)
    assert "overall" in results["object"]["cgf"]
    assert "overall" in results["object"]["rgf"]
    assert set(results["obj"]) == {
        "frechet_distance", "squared_mmd", "jsd", "mmd"
    }
    for v in results["obj"].values():
        assert np.isfinite(v)


def test_evaluate_our_ori_control_arm(tmp_path, monkeypatch):
    """``--method ori`` runs only the real-set object metrics (cgf/rgf), like
    the reference's control arm (``evaluate_our.py:351+`` gen_method checks)."""
    r = np.random.RandomState(1)
    sample_dir = tmp_path / "generated_results"
    _make_fg_info(sample_dir / "ori" / "inference_results", r)
    out = tmp_path / "ori.json"
    argv = [
        "evaluate_our.py",
        "--method", "ori",
        "--sample-dir", str(sample_dir),
        "-m", "jsd", "dcf", "cgf", "rgf",
        "--random-extractors",
        "--num-obj-points", "64",
        "--mc-passes", "2",
        "-o", str(out),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    _load_cli().main()
    results = json.loads(out.read_text())
    assert "bev" not in results      # no gen set → no scene metrics
    assert "dcf" not in results.get("object", {})
    assert "cgf" in results["object"] and "rgf" in results["object"]
