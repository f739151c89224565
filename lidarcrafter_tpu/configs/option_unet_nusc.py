"""Unconditional single-frame nuScenes diffusion config.

Mirrors ``lidargen/utils/configs/option_unet_nusc.py`` field-for-field (same
defaults; mixed precision is bf16 — the TPU-native equivalent of the
reference's fp16 AMP).
"""

from dataclasses import dataclass, field
from typing import Literal, Tuple


@dataclass
class ModelConfig:
    architecture: str = "efficient_unet"
    params: dict = field(
        default_factory=lambda: {
            "base_channels": 64,
            "temb_channels": None,
            "channel_multiplier": (1, 2, 4, 8),
            "num_residual_blocks": (3, 3, 3, 3),
            "gn_num_groups": 8,
            "gn_eps": 1e-6,
            "attn_num_heads": 8,
            "coords_encoding": "fourier_features",
            "ring": True,
        }
    )


@dataclass
class DiffusionConfig:
    num_training_steps: int | None = None
    num_sampling_steps: int = 1024
    prediction_type: Literal["eps", "v", "x_0"] = "eps"
    loss_type: str = "l2"
    noise_schedule: str = "cosine"
    timestep_type: Literal["continuous", "discrete"] = "continuous"


@dataclass
class TrainingConfig:
    batch_size_train: int = 2
    batch_size_eval: int = 8
    num_workers: int = 4
    num_steps: int = 300_000
    steps_save_image: int = 5_000
    steps_save_model: int = 10_000
    gradient_accumulation_steps: int = 1
    lr: float = 1e-4
    lr_warmup_steps: int = 10_000
    adam_beta1: float = 0.9
    adam_beta2: float = 0.99
    adam_weight_decay: float = 0.0
    adam_epsilon: float = 1e-8
    ema_decay: float = 0.995
    ema_update_every: int = 10
    mixed_precision: str = "bf16"  # TPU-native; reference uses fp16 AMP
    output_dir: str = "logs/diffusion"
    seed: int = 0


@dataclass
class DataConfig:
    dataset: Literal["kitti_raw", "kitti_360", "nuscenes"] = "nuscenes"
    data_root: str = "../data/nuscenes"
    depth_format: Literal["log_depth", "inverse_depth", "depth"] = "log_depth"
    scan_unfolding: bool = False
    projection: str = "spherical-1024"
    train_depth: bool = True
    train_reflectance: bool = True
    resolution: Tuple[int, int] = (32, 1024)
    min_depth: float = 1.45
    max_depth: float = 80.0
    fov_up: float = 10.0
    fov_down: float = -30.0
    split: str = "train"


@dataclass
class NUSC_Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
