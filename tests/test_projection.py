"""Golden parity: range-image projection vs reference common.py (spherical mode)."""

import numpy as np

import jax.numpy as jnp

from lidarcrafter_tpu.ops import (
    convert_boxes_to_2d,
    convert_points_to_2d,
    points_to_range_image,
)
from tests.reference_loader import load_ref_common

ref_common = load_ref_common()

H, W = 32, 1024


def _random_cloud(n, seed=0):
    rng = np.random.RandomState(seed)
    r = rng.uniform(1.0, 85.0, n)
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(np.deg2rad(-30), np.deg2rad(10), n)
    x = r * np.cos(el) * np.cos(az)
    y = r * np.cos(el) * np.sin(az)
    z = r * np.sin(el)
    intensity = rng.uniform(0, 1, n)
    return np.stack([x, y, z, intensity], axis=1).astype(np.float32)


def test_projection_parity_fp32():
    pts = _random_cloud(30_000)
    ref_img = ref_common.load_points_as_images(
        points=pts, scan_unfolding=False, H=H, W=W,
        min_depth=1.45, max_depth=80.0, fov_up=10.0, fov_down=-30.0,
    )
    ours = np.asarray(
        points_to_range_image(
            jnp.asarray(pts), H=H, W=W,
            min_depth=1.45, max_depth=80.0, fov_up=10.0, fov_down=-30.0,
        )
    )
    assert ours.shape == ref_img.shape == (H, W, 6)
    np.testing.assert_allclose(ours, ref_img, rtol=1e-5, atol=1e-5)


def test_projection_with_padding_mask():
    """Padding invariance: masked padded points must not change the image.

    (Exact reference parity is covered by test_projection_parity_fp32; points
    lying exactly on fp32 cell boundaries can legitimately land in adjacent
    pixels under different fusion orders, so this test compares our op against
    itself with and without padding.)
    """
    pts = _random_cloud(10_000, seed=3)
    padded = np.concatenate([pts, np.zeros((2048, 4), np.float32)], axis=0)
    mask = np.concatenate([np.ones(10_000, bool), np.zeros(2048, bool)])
    base = np.asarray(points_to_range_image(jnp.asarray(pts), H=H, W=W))
    ours = np.asarray(
        points_to_range_image(jnp.asarray(padded), jnp.asarray(mask), H=H, W=W)
    )
    np.testing.assert_allclose(ours, base, rtol=1e-6, atol=1e-6)


def test_convert_points_to_2d_parity():
    pts = _random_cloud(5_000, seed=5)
    ref_grid = ref_common.convert_points_to_2d(points=pts, H=H, W=W)
    ours = np.asarray(convert_points_to_2d(jnp.asarray(pts), H=H, W=W))
    np.testing.assert_allclose(ours, ref_grid, rtol=1e-5, atol=1e-6)


def test_convert_boxes_to_2d_parity():
    rng = np.random.RandomState(7)
    n_box = 13
    boxes = np.zeros((n_box, 8), np.float32)
    r = rng.uniform(5, 60, n_box)
    az = rng.uniform(-np.pi, np.pi, n_box)
    boxes[:, 0] = r * np.cos(az)
    boxes[:, 1] = r * np.sin(az)
    boxes[:, 2] = rng.uniform(-2, 1, n_box)
    boxes[:, 3:6] = rng.uniform(0.5, 6.0, (n_box, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_box)
    boxes[:, 7] = rng.randint(1, 10, n_box)

    ref_corners, ref_mask, ref_weight = ref_common.convert_boxes_to_2d(
        boxes_3d=boxes.astype(np.float64), H=H, W=W
    )
    corners, mask, weight = convert_boxes_to_2d(jnp.asarray(boxes), H=H, W=W)
    np.testing.assert_allclose(np.asarray(corners), ref_corners, rtol=1e-4, atol=1e-5)
    # reference mask is (2, H, W); ours (H, W, 2)
    np.testing.assert_allclose(
        np.asarray(mask).transpose(2, 0, 1), ref_mask, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(weight), ref_weight, rtol=1e-4, atol=1e-4)
