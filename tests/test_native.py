"""Native C++ data-path kernels: build, projection parity, prefetch loader."""

import numpy as np
import pytest

from lidarcrafter_tpu.native import (
    get_lib,
    native_enabled,
    project_range_image_native,
)
from lidarcrafter_tpu.native.loader import PrefetchLoader
from lidarcrafter_tpu.ops.projection import points_to_range_image


def test_native_builds_and_loads():
    # g++ is part of the baked toolchain; the library must build and dlopen
    assert get_lib() is not None
    assert native_enabled()


def _cloud(n, seed, c=4, scale=50.0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-scale, scale, (n, 3)).astype(np.float32)
    feats = rng.rand(n, c - 3).astype(np.float32) * 255.0
    return np.concatenate([pts, feats], axis=1)


@pytest.mark.parametrize("n,seed", [(1000, 0), (3333, 1), (34000, 2)])
def test_native_projection_matches_jax(n, seed):
    """Same winner + identical channels as ops.projection, modulo sub-ulp
    transcendental differences that can flip a cell assignment exactly at a
    floor() boundary (bounded to a trace fraction of pixels)."""
    pts = _cloud(n, seed)
    H, W = 32, 1024
    kw = dict(H=H, W=W, min_depth=1.45, max_depth=80.0)
    got = project_range_image_native(pts, **kw)
    want = np.asarray(points_to_range_image(pts, **kw))
    assert got.shape == want.shape == (H, W, 6)
    # winner agreement: copied point channels are bit-identical when the same
    # point won the pixel
    same_winner = np.all(got[..., :4] == want[..., :4], axis=-1)
    assert 1.0 - same_winner.mean() <= 2e-3, same_winner.mean()
    np.testing.assert_array_equal(got[same_winner][:, :4],
                                  want[same_winner][:, :4])
    np.testing.assert_array_equal(got[same_winner][:, 5],
                                  want[same_winner][:, 5])
    # the recomputed depth channel may differ by 1 ulp (XLA contracts
    # x*x+y*y+z*z with FMA; plain C++ rounds each product)
    np.testing.assert_allclose(got[same_winner][:, 4],
                               want[same_winner][:, 4], rtol=1e-6)


def test_native_projection_valid_channel():
    """Out-of-depth-range points still scatter, with valid=0
    (common.py:88-91 semantics)."""
    pts = np.array(
        [[0.5, 0.0, 0.0, 7.0],      # depth 0.5 < min_depth: scatters, invalid
         [0.0, 120.0, 0.0, 9.0]],   # depth > max_depth: scatters, invalid
        np.float32,
    )
    out = project_range_image_native(pts, H=32, W=1024,
                                     min_depth=1.45, max_depth=80.0)
    hit = out[..., 4] > 0
    assert hit.sum() == 2
    assert np.all(out[hit][:, 5] == 0.0)  # valid channel
    assert set(out[hit][:, 3].tolist()) == {7.0, 9.0}


class _FakeDS:
    def __init__(self, n=13, delay_odd=False):
        self.n = n
        self.delay_odd = delay_odd

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay_odd and i % 2:
            import time

            time.sleep(0.005)  # force out-of-order completion
        return {"x": np.full((2,), float(i), np.float32)}

    @staticmethod
    def collate_fn(samples):
        return {"x": np.stack([s["x"] for s in samples])}


@pytest.mark.parametrize("workers", [1, 3])
def test_prefetch_loader_matches_sync(workers):
    """Batch stream identical to a synchronous loop with the same seed, even
    when worker completion order scrambles."""
    ds = _FakeDS(n=13, delay_odd=True)
    B, seed = 4, 5
    loader = iter(PrefetchLoader(ds, B, num_workers=workers, queue_depth=3,
                                 seed=seed))
    got = [next(loader) for _ in range(7)]

    rng = np.random.RandomState(seed)
    want = []
    while len(want) < 7:
        order = rng.permutation(len(ds))
        for i in range(0, len(order) - B + 1, B):
            want.append(ds.collate_fn([ds[int(j)] for j in order[i : i + B]]))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["x"], w["x"])


def test_prefetch_loader_rejects_tiny_dataset():
    with pytest.raises(ValueError):
        PrefetchLoader(_FakeDS(n=3), batch_size=4)
