"""Model/engine factory mirroring ``lidargen/utils/inference.py``.

``build_diffusion_training(cfg)`` (cf. ``inference.py:261-344``) handles the
image-diffusion branches (unconditional + concat-conditioned);
``build_flow_training`` (cf. ``inference.py:370-393``), ``build_object_training``
(cf. ``inference.py:346-368`` object variant) and ``build_layout_training``
cover the MeanFlow / object-point / 1D-layout branches.  Each returns
``(model(s), engine, lidar_utils)`` with the flax model's ``apply`` wired into
a pure-function engine.
"""

from __future__ import annotations

from typing import Any

from ..diffusion import (
    CondContinuousDiffusion,
    ContinuousDiffusion,
    DiscreteDiffusion,
    MeanFlow,
)
from ..models import build_model
from ..utils.lidar import LiDARUtility


def _data_channels(cfg) -> int:
    return int(cfg.data.train_depth) + int(cfg.data.train_reflectance)


def _make_lidar_utils(cfg) -> LiDARUtility:
    return LiDARUtility.create(
        resolution=tuple(cfg.data.resolution),
        depth_format=cfg.data.depth_format,
        min_depth=cfg.data.min_depth,
        max_depth=cfg.data.max_depth,
        fov_up=cfg.data.fov_up,
        fov_down=cfg.data.fov_down,
    )


def _has_cond(cfg) -> bool:
    return getattr(cfg, "condition_model", None) is not None


def layout_condition_batch(cfg, batch_size: int, rng=None) -> dict:
    """Condition batch for the layout/autoregressive stacks at ``cfg``'s real
    topology — THE one encoding of the shape contract the samplers, the
    checkpoint converter's shape validation, bench, and the multichip dryrun
    all share: ``scaled_gt_boxes (B,L,9)``, ``gt_boxes_2d (B,L,4)``,
    ``is_valid_obj (B,L)`` ones, and — when the condition encoder declares
    ``out_channels`` — a ``concat_cond`` map, which for autoregressive tasks
    cedes its LAST channel to a separate ``(B,H,W,1) autoregressive_cond``
    (cf. reference ``lidargen/models/unets/layout_unet_v1.py:620-660`` cond
    assembly).  Zero-filled by default; pass ``rng`` for a random fill
    (uniform·0.5 boxes, normal·0.1 maps) as the dryrun equality proofs use.
    """
    import jax
    import jax.numpy as jnp

    B = batch_size
    H, W = cfg.data.resolution
    L = cfg.condition_model.params["layout_length"]
    cc = cfg.condition_model.params.get("out_channels", 0)
    autoreg = "autoregressive" in getattr(cfg.data, "task", "")

    if rng is None:
        boxes = lambda shape: jnp.zeros(shape, jnp.float32)
        cond_map = boxes
    else:
        ks = iter(jax.random.split(rng, 4))
        boxes = lambda shape: jax.random.uniform(next(ks), shape) * 0.5
        cond_map = lambda shape: jax.random.normal(next(ks), shape) * 0.1

    batch = {
        "scaled_gt_boxes": boxes((B, L, 9)),
        "gt_boxes_2d": boxes((B, L, 4)),
        "is_valid_obj": jnp.ones((B, L), jnp.float32),
    }
    if cc and autoreg:
        batch["concat_cond"] = cond_map((B, H, W, cc - 1))
        batch["autoregressive_cond"] = cond_map((B, H, W, 1))
    elif cc:
        batch["concat_cond"] = cond_map((B, H, W, cc))
    return batch


def build_diffusion_training(cfg) -> tuple[Any, Any, LiDARUtility]:
    """Image-diffusion branches; returns (models_dict_or_model, engine, utils).

    For conditioned configs the returned model is a dict
    ``{'model': denoiser, 'cond': condition_encoder}`` and engine params are
    expected as ``{'model': ..., 'cond': ...}``.
    """
    resolution = tuple(cfg.data.resolution)
    in_channels = _data_channels(cfg)
    cond_mode = getattr(cfg.diffusion, "cond_mode", None)
    if _has_cond(cfg) and cond_mode == "concat":
        in_channels += cfg.condition_model.params["out_channels"]

    model = build_model(
        cfg.model.architecture,
        in_channels=in_channels,
        resolution=resolution,
        use_ray_angle_coords="spherical" in cfg.data.projection,
        fov_up=cfg.data.fov_up,
        fov_down=cfg.data.fov_down,
        **cfg.model.params,
    )
    lidar_utils = _make_lidar_utils(cfg)
    data_shape = (*resolution, _data_channels(cfg))

    if cfg.diffusion.timestep_type == "discrete":
        engine = DiscreteDiffusion(
            apply_fn=lambda p, x, s: model.apply(p, x, s),
            sampling_shape=data_shape,
            num_training_steps=cfg.diffusion.num_training_steps,
            prediction_type=cfg.diffusion.prediction_type,
            loss_type=cfg.diffusion.loss_type,
            noise_schedule=cfg.diffusion.noise_schedule,
        )
        return model, engine, lidar_utils

    if not _has_cond(cfg):
        engine = ContinuousDiffusion(
            apply_fn=lambda p, x, log_snr: model.apply(p, x, log_snr),
            sampling_shape=data_shape,
            prediction_type=cfg.diffusion.prediction_type,
            loss_type=cfg.diffusion.loss_type,
            noise_schedule=cfg.diffusion.noise_schedule,
            clip_sample=getattr(cfg.diffusion, "clip_sample", True),
        )
        return model, engine, lidar_utils

    cond_model = build_model(
        cfg.condition_model.architecture, **cfg.condition_model.params
    )
    engine = CondContinuousDiffusion(
        apply_fn=lambda p, x, cd: model.apply(p["model"], x, cd),
        cond_apply_fn=lambda p, d: cond_model.apply(p["cond"], d),
        sampling_shape=data_shape,
        prediction_type=cfg.diffusion.prediction_type,
        loss_type=cfg.diffusion.loss_type,
        noise_schedule=cfg.diffusion.noise_schedule,
        clip_sample=getattr(cfg.diffusion, "clip_sample", True),
        cond_mode=cond_mode,
        w_loss_weight=getattr(cfg.diffusion, "w_loss_weight", False),
    )
    return {"model": model, "cond": cond_model}, engine, lidar_utils


def build_object_training(cfg) -> tuple[dict, CondContinuousDiffusion, LiDARUtility]:
    """Per-object point diffusion (nuscenes-object); cf. ``inference.py:346-368``
    and the 1D cond engine ``continuous_time_1d_cond.py:9``."""
    model = build_model(cfg.model.architecture, **cfg.model.params)
    cond_model = build_model(
        cfg.condition_model.architecture, **cfg.condition_model.params
    )
    engine = CondContinuousDiffusion(
        apply_fn=lambda p, x, cd: model.apply(p["model"], x, cd),
        cond_apply_fn=lambda p, d: cond_model.apply(p["cond"], d),
        sampling_shape=(cfg.data.num_samples, cfg.model.params["point_dim"]),
        prediction_type=cfg.diffusion.prediction_type,
        loss_type=cfg.diffusion.loss_type,
        noise_schedule=cfg.diffusion.noise_schedule,
        clip_sample=getattr(cfg.diffusion, "clip_sample", True),
    )
    return {"model": model, "cond": cond_model}, engine, _make_lidar_utils(cfg)


def build_flow_training(cfg) -> tuple[Any, MeanFlow, LiDARUtility]:
    """MeanFlow branch (meanflow-nusc); cf. ``inference.py:370-393``."""
    resolution = tuple(cfg.data.resolution)
    in_channels = _data_channels(cfg)
    model = build_model(
        cfg.model.architecture,
        in_channels=in_channels,
        resolution=resolution,
        use_ray_angle_coords="spherical" in cfg.data.projection,
        fov_up=cfg.data.fov_up,
        fov_down=cfg.data.fov_down,
        **cfg.model.params,
    )
    engine = MeanFlow(
        apply_fn=lambda p, z, t, r: model.apply(p, z, t, r),
        sampling_shape=(*resolution, in_channels),
        flow_ratio=cfg.flow.flow_ratio,
        time_dist=cfg.flow.time_dist[0],
        time_mu=float(cfg.flow.time_dist[1]),
        time_sigma=float(cfg.flow.time_dist[2]),
    )
    return model, engine, _make_lidar_utils(cfg)


def build_layout_training(cfg, num_objs: int = 9, num_preds: int = 16):
    """1D layout diffusion branch (nuscenes-layout): UNet1D + SceneGraph GCN.

    cf. ``inference.py:346-368`` (load_model_layout_duffusion_training); the
    scene-graph vocab sizes are injected from the dataset in the reference
    (``generate_layout.py:23``) and passed explicitly here.

    Note: the GCN's BatchNorm runs in running-average mode inside the jitted
    engine; train-time batch-stat updates are wired via the ``batch_stats``
    collection when training this branch.
    """
    from ..diffusion.layout import CondLayoutDiffusion

    model = build_model(cfg.model.architecture, **cfg.model.params)
    cond_model = build_model(
        cfg.condition_model.architecture,
        num_objs=num_objs,
        num_preds=num_preds,
        **cfg.condition_model.params,
    )

    def cond_apply(params, sg, rng):
        return cond_model.apply(
            params["cond"],
            sg["objs"],
            sg["triples"],
            sg["text_feats"],
            sg["rel_feats"],
            added_mask=sg.get("added_mask"),
            manipulated_mask=sg.get("manipulated_mask"),
            edge_mask=sg.get("edge_mask"),
            rng=rng,
        )

    engine = CondLayoutDiffusion(
        apply_fn=lambda p, x, cd: model.apply(p["model"], x, cd),
        cond_apply_fn=cond_apply,
        sampling_shape=(cfg.model.params.get("in_channels", 20),),
        prediction_type=cfg.diffusion.prediction_type,
        loss_type=cfg.diffusion.loss_type,
        noise_schedule=cfg.diffusion.noise_schedule,
        clip_sample=getattr(cfg.diffusion, "clip_sample", True),
    )
    return {"model": model, "cond": cond_model}, engine, _make_lidar_utils(cfg)
