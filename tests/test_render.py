"""Render utils: rasterizer placement, surface normals, colorize."""

import numpy as np

import jax.numpy as jnp

from lidarcrafter_tpu.utils.render import (
    bilinear_rasterizer,
    colorize,
    estimate_surface_normal,
    render_point_clouds,
)


def test_bilinear_rasterizer_exact_pixel():
    coords = jnp.asarray([[[2.0, 3.0]]])  # exact integer position
    values = jnp.asarray([[[5.0]]])
    out = np.asarray(bilinear_rasterizer(coords, values, (8, 8)))
    assert out.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(out[0, 2, 3, 0], 5.0, atol=1e-6)
    np.testing.assert_allclose(out.sum(), 5.0, atol=1e-5)


def test_bilinear_rasterizer_splits_weight():
    coords = jnp.asarray([[[2.5, 3.0]]])  # halfway between rows 2 and 3
    values = jnp.asarray([[[4.0]]])
    out = np.asarray(bilinear_rasterizer(coords, values, (8, 8)))
    np.testing.assert_allclose(out[0, 2, 3, 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(out[0, 3, 3, 0], 2.0, atol=1e-5)


def test_surface_normal_of_plane():
    """Points on the z=c plane → normals ±z."""
    H, W = 16, 32
    xs = np.linspace(1, 10, W)
    ys = np.linspace(1, 10, H)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx, gy, np.full_like(gx, 2.0)], axis=-1)[None].astype(np.float32)
    n = np.asarray(estimate_surface_normal(jnp.asarray(pts), d=1))
    inner = n[0, 2:-2, 2:-2, 2]
    assert (np.abs(np.abs(inner) - 1.0) < 1e-3).all()


def test_render_point_clouds_runs():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.3, 0.3, (1, 500, 3)).astype(np.float32)
    bev = np.asarray(
        render_point_clouds(jnp.asarray(pts), t=jnp.asarray([[0, 0, 1.0]]), size=64)
    )
    assert bev.shape == (1, 64, 64, 3)
    assert np.isfinite(bev).all()
    assert bev.max() > 0


def test_colorize_shapes():
    x = jnp.linspace(0, 1, 32).reshape(1, 4, 8)
    out = np.asarray(colorize(x))
    assert out.shape == (1, 4, 8, 3)
    assert out.min() >= 0 and out.max() <= 1
