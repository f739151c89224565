"""Point-cloud semantic segmenter driver (PTv3 wrapper + native fallback).

The reference's PTv3 is a thin wrapper around the external ``pointcept``
library (``lidargen/metrics/models/ptv3/model.py:19-87`` — the backbone is
not vendored): grid-subsample a cloud, run the segmenter, map predictions
back through the inverse index, softmax-argmax, colorize.  Here:

* :class:`PTv3Segmenter` mirrors that wrapper behind a gated ``pointcept``
  import (the environment ships neither pointcept nor its checkpoints);
* :func:`segment_cloud` provides the TPU-native path with the same
  subsample → segment → devoxelize-by-inverse contract, running our
  :class:`~lidarcrafter_tpu.metrics.extractor.sparse_unet.MinkowskiNet`
  (17-class nuScenes head) as the backbone.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# nuScenes 16-class palette (+ void), matching the reference's colormap use.
NUSC_COLORMAP = np.array(
    [
        [0, 0, 0], [255, 120, 50], [255, 192, 203], [255, 255, 0],
        [0, 150, 245], [0, 255, 255], [255, 127, 0], [255, 0, 0],
        [255, 240, 150], [135, 60, 0], [160, 32, 240], [255, 0, 255],
        [139, 137, 137], [75, 0, 75], [150, 240, 80], [230, 230, 250],
        [0, 175, 0],
    ],
    np.uint8,
)


def segment_cloud(model, params, points: np.ndarray, max_points: int = 65536):
    """Native per-point semantic labels + colors.

    ``model``: a MinkowskiNet (or any backbone returning per-voxel ``output``
    logits + level-0 coords); labels are devoxelized to points through the
    voxel each point falls in (the reference's ``pred[data_dict['inverse']]``,
    ``ptv3/model.py:79-80``).
    """
    from ...ops.sparse import voxelize

    pts = np.asarray(points, np.float32)[:max_points]
    n = len(pts)
    pad = np.zeros((max_points, 3), np.float32)
    pad[:n] = pts[:, :3]
    feats = np.zeros((max_points, 4), np.float32)
    feats[:n, :3] = pts[:, :3]
    if pts.shape[1] > 3:
        feats[:n, 3] = pts[:, 3]
    mask = np.arange(max_points) < n

    out = model.apply(params, jnp.asarray(pad), jnp.asarray(feats), jnp.asarray(mask))
    logits = np.asarray(out["output"])

    # point → voxel inverse map: repeat the model's own (deterministic)
    # quantization call to recover the inverse it used internally.
    _, _, _, inv = (
        np.asarray(a)
        for a in voxelize(
            jnp.asarray(pad), model.voxel_size,
            point_mask=jnp.asarray(mask), max_voxels=model.max_voxels,
        )
    )
    pred = logits.argmax(-1)[inv[:n]]
    colors = NUSC_COLORMAP[np.clip(pred, 0, len(NUSC_COLORMAP) - 1)]
    return pred, colors


class PTv3Segmenter:
    """cf. ``PTv3`` (``ptv3/model.py:19-87``); requires pointcept (gated)."""

    def __init__(self, config_file: str, weight: str | None = None):
        try:
            import torch  # noqa: F401
            from pointcept.engines.defaults import default_config_parser
            from pointcept.models import build_model
        except ImportError as e:
            raise ImportError(
                "PTv3Segmenter needs the external pointcept library (as in the "
                "reference); use segment_cloud() with a MinkowskiNet for the "
                "native path."
            ) from e
        import torch

        self.cfg = default_config_parser(config_file, None)
        if weight is not None:
            self.cfg.weight = weight
        self.model = build_model(self.cfg.model)
        ckpt = torch.load(self.cfg.weight, map_location="cpu", weights_only=False)
        state = {
            (k[7:] if k.startswith("module.") else k): v
            for k, v in ckpt["state_dict"].items()
        }
        self.model.load_state_dict(state, strict=True)
        self.model.eval()

    def inference_one_sample(self, points: np.ndarray):
        import torch
        import torch.nn.functional as F
        from pointcept.datasets import build_dataset, collate_fn

        dataset = build_dataset(self.cfg.data.val)
        data_dict = dataset.getitem_from_outline(
            dict(coord=points[:, :3], strength=points[:, 3].reshape(-1, 1))
        )
        input_dict = collate_fn([data_dict])
        with torch.no_grad():
            pred = self.model(input_dict)["seg_logits"]
            pred = F.softmax(pred[data_dict["inverse"]], -1)
        pred = pred.max(1)[1].numpy()
        return pred, NUSC_COLORMAP[np.clip(pred, 0, len(NUSC_COLORMAP) - 1)]
