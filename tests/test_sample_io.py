"""Reference sample-dump interop (``utils/sample_io.py``): .pth range-image
loading matches the reference's masking math (``evaluate_from_samples.py:
19-45``), nearest-exact resize matches torch, save→load round-trips, and a
reference-format .pth fixture scores through the full metric JSON
(VERDICT round-3 task 6 done-criterion)."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from lidarcrafter_tpu.utils.sample_io import (
    MAX_DEPTH,
    MIN_DEPTH,
    _nearest_exact_chw,
    list_sample_files,
    load_point_file,
    load_pth_points,
    pth_to_points,
    save_pth_sample,
)

REPO = Path(__file__).resolve().parent.parent


def _make_dump(r, H=8, W=64):
    """(5, H, W) [depth, xyz, reflectance] with in/out-of-range depths."""
    depth = r.rand(H, W).astype(np.float32) * 80.0  # some beyond MAX_DEPTH
    depth[0, :4] = 0.1  # below MIN_DEPTH
    xyz = r.randn(3, H, W).astype(np.float32) * 10
    refl = r.rand(1, H, W).astype(np.float32)
    return np.concatenate([depth[None], xyz, refl], axis=0)


def test_mask_math_matches_reference():
    """Literal mirror of Samples.__getitem__ + the points flatten
    (evaluate_from_samples.py:33-45, 98-100)."""
    r = np.random.RandomState(0)
    img = _make_dump(r)
    # reference math in torch
    t = torch.from_numpy(img)
    depth = t[[0]]
    mask = torch.logical_and(depth > MIN_DEPTH, depth < MAX_DEPTH).float()
    masked = t * mask
    ref_pts = (masked[1:4] * mask).reshape(3, -1).T.numpy()

    ours = pth_to_points(img, keep_zeros=True)
    np.testing.assert_allclose(ours[:, :3], ref_pts, atol=1e-7)
    # default drops the zeroed rows
    kept = pth_to_points(img)
    valid = ((img[0] > MIN_DEPTH) & (img[0] < MAX_DEPTH)).reshape(-1)
    assert kept.shape == (valid.sum(), 4)
    np.testing.assert_allclose(kept[:, :3], ref_pts[valid], atol=1e-7)
    np.testing.assert_allclose(
        kept[:, 3], (img[4].reshape(-1))[valid], atol=1e-7
    )


def test_nearest_exact_matches_torch():
    r = np.random.RandomState(1)
    img = r.randn(5, 8, 64).astype(np.float32)
    for size in [(4, 32), (16, 128), (8, 64), (3, 50)]:
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(img)[None], size=size, mode="nearest-exact"
        )[0].numpy()
        np.testing.assert_array_equal(_nearest_exact_chw(img, size), ref)


def test_save_load_roundtrip(tmp_path):
    r = np.random.RandomState(2)
    H, W = 8, 64
    depth = (r.rand(H, W, 1) * 50 + 1).astype(np.float32)  # all in range
    xyz = r.randn(H, W, 3).astype(np.float32)
    refl = r.rand(H, W, 1).astype(np.float32)
    p = tmp_path / "samples_0000000_tok.pth"
    save_pth_sample(p, depth, xyz, refl)

    img = torch.load(p, map_location="cpu").numpy()
    assert img.shape == (5, H, W)
    np.testing.assert_allclose(img[0], depth[..., 0], atol=1e-7)

    pts = load_pth_points(p)
    assert pts.shape == (H * W, 4)
    np.testing.assert_allclose(pts[:, :3], xyz.reshape(-1, 3), atol=1e-7)
    np.testing.assert_allclose(pts[:, 3], refl.reshape(-1), atol=1e-7)

    # the generic dispatcher sees .pth alongside point files
    np.savetxt(tmp_path / "a.txt", np.zeros((4, 3)))
    files = list_sample_files(tmp_path)
    assert [f.suffix for f in files] == [".txt", ".pth"]
    assert load_point_file(p).shape == (H * W, 4)


def test_resize_applies_before_mask():
    r = np.random.RandomState(3)
    img = _make_dump(r, H=4, W=32)
    pts = pth_to_points(img, resolution=(8, 64), keep_zeros=True)
    assert pts.shape == (8 * 64, 4)
    up = _nearest_exact_chw(img, (8, 64))
    valid = ((up[0] > MIN_DEPTH) & (up[0] < MAX_DEPTH)).reshape(-1)
    np.testing.assert_allclose(
        pts[valid, :3], up[1:4].reshape(3, -1).T[valid], atol=1e-7
    )


def _load_cli():
    spec = importlib.util.spec_from_file_location(
        "evaluate_our_cli", REPO / "tools" / "evaluate_our.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pth_dumps_score_through_metric_json(tmp_path, monkeypatch):
    """Reference-format .pth dumps as the GEN arm → full nested metric JSON
    (scene metrics vs .npy real clouds)."""
    r = np.random.RandomState(4)
    sample_dir = tmp_path / "generated_results"
    real_dir = tmp_path / "real"
    real_dir.mkdir()
    (sample_dir / "our").mkdir(parents=True)
    for i in range(3):
        pts = np.concatenate(
            [r.rand(512, 2) * 60 - 30, r.rand(512, 1) * 4 - 2, r.rand(512, 1)],
            axis=1,
        ).astype(np.float32)
        np.save(real_dir / f"r{i}.npy", pts)
        # gen arm: (5, H, W) dumps with plausible geometry
        H, W = 8, 64
        depth = (r.rand(H, W) * 40 + 2).astype(np.float32)
        xyz = r.randn(3, H, W).astype(np.float32) * 15
        refl = r.rand(1, H, W).astype(np.float32)
        torch.save(
            torch.from_numpy(np.concatenate([depth[None], xyz, refl], 0)),
            sample_dir / "our" / f"samples_{i:07d}_tok{i}.pth",
        )

    out = tmp_path / "results.json"
    monkeypatch.setattr(sys, "argv", [
        "evaluate_our.py", "--method", "our",
        "--sample-dir", str(sample_dir), "--real-dir", str(real_dir),
        "-m", "jsd", "mmd", "cd", "-o", str(out),
    ])
    _load_cli().main()
    results = json.loads(out.read_text())
    assert set(results["bev"]) == {"jsd", "mmd"}
    assert np.isfinite(results["scene"]["cd"])
    for v in results["bev"].values():
        assert np.isfinite(v)
