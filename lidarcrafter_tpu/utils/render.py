"""Rendering / visualization utilities (pure jnp, NHWC).

Re-designs ``lidargen/utils/render.py`` (245 LoC): BEV point-cloud splatting
via a bilinear scatter-add rasterizer, surface-normal estimation from
coordinated range images (circular azimuth padding), and colormap colorize.
Used by train-time image logging (``train_lidm.py:173-198``).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def make_Rt(roll=0.0, pitch=0.0, yaw=0.0, x=0.0, y=0.0, z=0.0):
    """Extrinsics (yaw → pitch → roll order); cf. ``render.py:9-29``."""

    def rot(axis, a):
        c, s = np.cos(a), np.sin(a)
        if axis == "x":
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        if axis == "y":
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    R = rot("z", yaw) @ rot("y", pitch) @ rot("x", roll)
    return jnp.asarray(R[None], jnp.float32), jnp.asarray([[x, y, z]], jnp.float32)


def bilinear_rasterizer(
    coords: jnp.ndarray, values: jnp.ndarray, out_shape: tuple[int, int]
) -> jnp.ndarray:
    """Splat (B, N, C) values at float (B, N, 2) coords; cf. ``render.py:85-146``.

    Returns (B, H, W, C).
    """
    B, N, C = values.shape
    H, W = out_shape
    h = coords[..., 0]
    w = coords[..., 1]
    h_t = jnp.floor(h)
    h_b = h_t + 1
    w_l = jnp.floor(w)
    w_r = w_l + 1
    h_t_s = jnp.clip(h_t, 0, H - 1)
    h_b_s = jnp.clip(h_b, 0, H - 1)
    w_l_s = jnp.clip(w_l, 0, W - 1)
    w_r_s = jnp.clip(w_r, 0, W - 1)
    wt_ht = (h_b - h) * (h_t == h_t_s)
    wt_hb = (h - h_t) * (h_b == h_b_s)
    wt_wl = (w_r - w) * (w_l == w_l_s)
    wt_wr = (w - w_l) * (w_r == w_r_s)

    out = jnp.zeros((B, H * W, C), values.dtype)

    def scatter(out, wt, hh, ww):
        wt = wt * (wt >= 1e-3)
        idx = (ww + W * hh).astype(jnp.int32)
        return jax.vmap(lambda o, i, v: o.at[i].add(v))(
            out, idx, values * wt[..., None]
        )

    out = scatter(out, wt_ht * wt_wl, h_t_s, w_l_s)
    out = scatter(out, wt_ht * wt_wr, h_t_s, w_r_s)
    out = scatter(out, wt_hb * wt_wl, h_b_s, w_l_s)
    out = scatter(out, wt_hb * wt_wr, h_b_s, w_r_s)
    return out.reshape(B, H, W, C)


@partial(jax.jit, static_argnames=("size", "focal_length"))
def render_point_clouds(
    points: jnp.ndarray,
    colors: jnp.ndarray | None = None,
    size: int = 800,
    R: jnp.ndarray | None = None,
    t: jnp.ndarray | None = None,
    focal_length: float = 1.0,
) -> jnp.ndarray:
    """BEV splat of (B, N, 3) clouds → (B, size, size, 3); cf. ``render.py:32-82``."""
    points = points.at[..., 2].multiply(-1)
    B, N, _ = points.shape
    if colors is None:
        colors = jnp.ones((B, N, 3), points.dtype)
    if R is not None:
        points = points @ R
    if t is not None:
        points = points + t
    # pinhole projection (cx = cy = 0.5, points toward +z)
    z = points[..., 2:3]
    uv = points[..., :2] * focal_length / jnp.where(jnp.abs(z) < 1e-8, 1e-8, z) + 0.5
    uv = uv * size
    mask = ((0 < uv) & (uv < size - 1)).all(axis=-1, keepdims=True)
    colors = colors * mask
    uv = size - uv
    depth = jnp.linalg.norm(points, axis=-1, keepdims=True)
    weight = jnp.exp(-3.0 * depth) * (depth > 1e-8)
    bev = bilinear_rasterizer(uv, weight * colors, (size, size))
    norm = bilinear_rasterizer(uv, weight, (size, size))
    return bev / (norm + 1e-8)


_OFFSETS = np.array(
    [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]
)


@partial(jax.jit, static_argnames=("d", "mode"))
def estimate_surface_normal(
    points: jnp.ndarray, d: int = 2, mode: str = "closest"
) -> jnp.ndarray:
    """Surface normals from a coordinated range image (B, H, W, 3);
    cf. ``render.py:149-238``: replicate-pad H, circular-pad W (azimuth ring),
    cross products over 8 neighbor pairs."""
    B, H, W, _ = points.shape
    p = jnp.pad(points, ((0, 0), (d, d), (0, 0), (0, 0)), mode="edge")
    p = jnp.pad(p, ((0, 0), (0, 0), (d, d), (0, 0)), mode="wrap")

    hh = jnp.arange(H) + d
    ww = jnp.arange(W) + d
    anchors = p[:, hh[:, None], ww[None, :]]  # (B, H, W, 3)

    def neigh(k):
        dh, dw = _OFFSETS[k] * d
        return p[:, (hh + dh)[:, None], (ww + dw)[None, :]]

    p1 = jnp.stack([neigh(k) for k in range(8)], axis=1)  # (B, 8, H, W, 3)
    p2 = jnp.stack([neigh((k + 2) % 8) for k in range(8)], axis=1)

    if mode == "closest":
        diff = jnp.linalg.norm(p1 - anchors[:, None], axis=-1) + jnp.linalg.norm(
            p2 - anchors[:, None], axis=-1
        )
        i = jnp.argmin(diff, axis=1)  # (B, H, W)
        sel = lambda t: jnp.take_along_axis(t, i[:, None, ..., None], axis=1)[:, 0]
        v1 = sel(p1) - anchors
        v2 = sel(p2) - anchors
        normals = jnp.cross(v1, v2)
    elif mode == "mean":
        v1 = p1 - anchors[:, None]
        v2 = p2 - anchors[:, None]
        normals = jnp.mean(jnp.cross(v1, v2), axis=1)
    else:
        raise NotImplementedError(mode)
    return normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-8)


_TURBO = None


def _turbo_colors():
    global _TURBO
    if _TURBO is None:
        try:
            import matplotlib.cm as cm

            _TURBO = np.asarray(cm.turbo(np.linspace(0, 1, 256))[:, :3], np.float32)
        except Exception:  # matplotlib-free fallback: grayscale ramp
            g = np.linspace(0, 1, 256, dtype=np.float32)
            _TURBO = np.stack([g, g, g], axis=1)
    return _TURBO


def colorize(tensor: jnp.ndarray, colors: np.ndarray | None = None) -> jnp.ndarray:
    """(B, H, W[, 1]) in [0, 1] → (B, H, W, 3) colormapped; cf. ``render.py:240-245``."""
    colors = jnp.asarray(colors if colors is not None else _turbo_colors())
    if tensor.ndim == 4:
        tensor = tensor[..., 0]
    ids = jnp.clip((tensor * 256).astype(jnp.int32), 0, 255)
    return colors[ids]
