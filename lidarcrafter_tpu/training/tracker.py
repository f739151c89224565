"""Training observability: scalar trackers + sample-image rendering.

Replaces the reference's Accelerate tensorboard tracker and its training-time
image logging (``tools/train/train_lidm.py:57-73,173-198,237-244``):

- :class:`JsonlTracker` — scalars to ``events.jsonl`` + PNG image dumps (no
  extra deps; greppable, artifact-friendly);
- :class:`TensorBoardTracker` — ``torch.utils.tensorboard`` events, same
  on-disk format the reference writes;
- :func:`render_sample_images` — depth / metric-depth / reflectance / mask
  colorizations and the surface-normal BEV splat, mirroring the reference's
  ``log_images`` closure.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from ..utils import render


class JsonlTracker:
    """Scalars → ``<log_dir>/events.jsonl``; images → ``<log_dir>/images/``."""

    def __init__(self, log_dir: str):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.log_dir / "events.jsonl", "a")

    def log(self, scalars: dict, step: int) -> None:
        rec = {"step": int(step), "wall_time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def log_images(self, images: dict, step: int) -> None:
        from PIL import Image

        out = self.log_dir / "images" / f"{int(step):010d}"
        out.mkdir(parents=True, exist_ok=True)
        for tag, img in images.items():
            img = np.asarray(img)
            if img.ndim == 4:  # (B, H, W, 3) → vertical strip
                img = img.reshape(-1, *img.shape[2:])
            if img.dtype != np.uint8:
                img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
            Image.fromarray(img).save(out / (tag.replace("/", "_") + ".png"))

    def close(self) -> None:
        self._fh.close()


class TensorBoardTracker:
    """``torch.utils.tensorboard`` writer (same event format the reference's
    Accelerate tracker emits)."""

    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter

        self.writer = SummaryWriter(log_dir)

    def log(self, scalars: dict, step: int) -> None:
        for k, v in scalars.items():
            self.writer.add_scalar(k, float(v), int(step))

    def log_images(self, images: dict, step: int) -> None:
        for tag, img in images.items():
            img = np.asarray(img)
            if img.ndim == 3:
                img = img[None]
            if img.dtype == np.uint8:
                img = img.astype(np.float32) / 255.0
            self.writer.add_images(tag, img, int(step), dataformats="NHWC")

    def close(self) -> None:
        self.writer.close()


def make_tracker(kind: str | None, log_dir: str):
    if kind in (None, "none"):
        return None
    if kind == "jsonl":
        return JsonlTracker(log_dir)
    if kind == "tensorboard":
        return TensorBoardTracker(log_dir)
    raise ValueError(f"unknown tracker kind: {kind!r}")


def render_sample_images(
    sample: jnp.ndarray,
    lidar_utils,
    train_depth: bool = True,
    train_reflectance: bool = True,
    tag: str = "sample",
    bev_size: int = 512,
) -> dict:
    """(B, H, W, C) normalized [-1, 1] image → tag→uint8 RGB dict; cf. the
    reference ``log_images`` (``train_lidm.py:57-73``)."""
    img = lidar_utils.denormalize(jnp.clip(sample, -1, 1))
    out: dict = {}
    ch = 0
    if train_depth:
        depth = img[..., ch : ch + 1]
        ch += 1
        metric = lidar_utils.revert_depth(depth)
        mask = (
            (metric > lidar_utils.min_depth) & (metric < lidar_utils.max_depth)
        ).astype(jnp.float32)
        out[f"{tag}/depth"] = render.colorize(depth)
        out[f"{tag}/depth_orig"] = render.colorize(metric / lidar_utils.max_depth)
        out[f"{tag}/mask"] = render.colorize(mask)
        xyz = lidar_utils.to_xyz(metric) / lidar_utils.max_depth * mask
        normal = lidar_utils.denormalize(-render.estimate_surface_normal(xyz))
        B = xyz.shape[0]
        bev = render.render_point_clouds(
            points=xyz.reshape(B, -1, 3),
            colors=normal.reshape(B, -1, 3),
            size=bev_size,
            t=jnp.asarray([0.0, 0.0, 1.0]),
        )
        out[f"{tag}/bev"] = jnp.clip(bev, 0.0, 1.0)
    if train_reflectance:
        out[f"{tag}/reflectance"] = render.colorize(img[..., ch : ch + 1])
    return {k: np.clip(np.asarray(v) * 255.0, 0, 255).astype(np.uint8)
            for k, v in out.items()}
