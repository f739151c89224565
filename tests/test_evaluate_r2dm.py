"""R2DM baseline-eval driver (``tools/evaluate_r2dm.py``): mirrors the
reference's ``tools/evaluation/evaluate_r2dm.py`` — gen arm of (5, H, W)
``.pth`` dumps with (0.5, 63) depth masking, real arm from point files,
zeros-kept flattened clouds /80 for PointNet, BEV JSD/MMD against a
``random.Random(0)``-shuffled real subsample, nested {img, pts, bev, info}
JSON output."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parent.parent


def _load_cli():
    spec = importlib.util.spec_from_file_location(
        "evaluate_r2dm_cli", REPO / "tools" / "evaluate_r2dm.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_dump(path, r, H=8, W=64):
    depth = (r.rand(H, W) * 40 + 2).astype(np.float32)
    depth[0, :6] = 0.2  # below MIN_DEPTH → masked out
    depth[1, :6] = 70.0  # above MAX_DEPTH → masked out
    xyz = r.randn(3, H, W).astype(np.float32) * 15
    refl = r.rand(1, H, W).astype(np.float32)
    torch.save(torch.from_numpy(np.concatenate([depth[None], xyz, refl], 0)), path)


def test_gen_image_mask_matches_reference(tmp_path):
    """_gen_image == Samples.__getitem__ (evaluate_r2dm.py:38-44)."""
    cli = _load_cli()
    p = tmp_path / "s.pth"
    _write_dump(p, np.random.RandomState(0))
    img, mask = cli._gen_image(p, 8, 64)
    # reference math in torch
    raw = torch.load(p, map_location="cpu", weights_only=False).numpy()
    ref_mask = ((raw[0] > 0.5) & (raw[0] < 63.0)).astype(np.float32)
    np.testing.assert_allclose(mask, ref_mask)
    np.testing.assert_allclose(img, raw * ref_mask[None], atol=1e-7)
    assert img[0, 0, 0] == 0.0 and img[0, 1, 0] == 0.0  # both windows masked


def test_r2dm_driver_end_to_end(tmp_path, monkeypatch):
    """Full run with random extractors → nested JSON with finite img/pts/bev
    metrics; real-set cache is written and reused."""
    r = np.random.RandomState(1)
    gen_dir = tmp_path / "r2dm"
    real_dir = tmp_path / "real"
    gen_dir.mkdir()
    real_dir.mkdir()
    for i in range(3):
        _write_dump(gen_dir / f"{i:05d}.pth", r)
        pts = np.concatenate(
            [r.rand(512, 2) * 60 - 30, r.rand(512, 1) * 4 - 2, r.rand(512, 1)],
            axis=1,
        ).astype(np.float32)
        np.save(real_dir / f"r{i}.npy", pts)

    out = tmp_path / "results.json"
    argv = [
        "evaluate_r2dm.py", "--sample-dir", str(gen_dir),
        "--real-dir", str(real_dir), "--resolution", "8", "64",
        "--random-extractors", "--batch-size", "2",
        "--cache-dir", str(tmp_path / "cache"), "-o", str(out),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    _load_cli().main()
    results = json.loads(out.read_text())
    assert results["info"]["#real"] == 3 and results["info"]["#fake"] == 3
    for section in ("img", "pts"):
        assert set(results[section]) == {"frechet_distance", "squared_mmd"}
        for v in results[section].values():
            assert np.isfinite(v)
    assert set(results["bev"]) == {"jsd", "mmd"}
    for v in results["bev"].values():
        assert np.isfinite(v)
    # cache name is keyed on the extractor/real-dir/limit fingerprint so a
    # random-extractor smoke can never poison a pretrained run
    assert list((tmp_path / "cache").glob("real_set_8x64_*.pkl"))

    # second run hits the cache (and --no-reflectance drops the img branch)
    monkeypatch.setattr(sys, "argv", argv + ["--no-reflectance"])
    _load_cli().main()
    results2 = json.loads(out.read_text())
    assert results2["img"] == {}
    assert results2["bev"]["jsd"] == pytest.approx(results["bev"]["jsd"], rel=1e-5)
