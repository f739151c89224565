"""Batch preprocessing for the diffusion trainers (pure jnp, NHWC).

Re-designs the preprocessing closures of ``tools/train/train_lidm.py:154-167``
and ``tools/train/train_lidm_cond.py:147-214``: depth codec + [-1,1]
normalization for the denoised channels, one-hot semantic + normalized depth
for the concat condition, depth(+reflectance) for the autoregressive condition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.lidar import LiDARUtility


def preprocess_x0(
    batch: dict,
    lidar_utils: LiDARUtility,
    train_depth: bool = True,
    train_reflectance: bool = True,
) -> jnp.ndarray:
    """depth/reflectance (B,H,W,1) each → normalized x_0 (B,H,W,C);
    cf. ``train_lidm.py:154-167``."""
    x = []
    if train_depth:
        x.append(lidar_utils.convert_depth(batch["depth"]))
    if train_reflectance:
        x.append(batch["reflectance"])
    return lidar_utils.normalize(jnp.concatenate(x, axis=-1))


def preprocess_condition_mask(
    batch: dict, lidar_utils: LiDARUtility, num_classes: int = 8
) -> jnp.ndarray:
    """condition_mask (B,H,W,2) [semantic, depth] → (B,H,W,num_classes+2);
    cf. ``train_lidm_cond.py:201-214``."""
    cm = batch["condition_mask"]
    labels = cm[..., 0].astype(jnp.int32)
    one_hot = jax.nn.one_hot(labels, num_classes + 1)
    depth = lidar_utils.convert_depth(cm[..., 1:2])
    return jnp.concatenate([one_hot, depth], axis=-1)


def preprocess_autoregressive_cond(
    cond: jnp.ndarray,
    lidar_utils: LiDARUtility,
    include_reflectance: bool = False,
) -> jnp.ndarray:
    """(B,H,W,2) [depth, reflectance] → normalized condition channels;
    cf. ``train_lidm_cond.py:183-199`` (nuscenes-auto-reg-v2 drops intensity)."""
    x = [lidar_utils.convert_depth(cond[..., 0:1])]
    if include_reflectance:
        x.append(cond[..., 1:2])
    return lidar_utils.normalize(jnp.concatenate(x, axis=-1))


def postprocess_sample(
    sample: jnp.ndarray, lidar_utils: LiDARUtility
) -> dict:
    """Generated [-1,1] image → metric depth, xyz, reflectance;
    cf. ``tools/generate/generate.py:51-57`` / ``sample_and_save_temporal.py:195-200``."""
    img = lidar_utils.denormalize(sample)
    depth = lidar_utils.revert_depth(img[..., 0:1])
    xyz = lidar_utils.to_xyz(depth)
    out = {"depth": depth, "xyz": xyz}
    if sample.shape[-1] > 1:
        out["reflectance"] = img[..., 1:2]
    return out
