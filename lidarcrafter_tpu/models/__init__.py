"""Model zoo registry, mirroring ``lidargen/models/unets/__init__.py:15-30``.

Entries are appended as each family lands; keys match the reference so configs
and checkpoints can drive the TPU backend unchanged.
"""

from .efficient_unet import EfficientUNet, EfficientUNetCond

__all_models__ = {
    "efficient_unet": EfficientUNet,
    "efficient_unet_cond": EfficientUNetCond,
}


def build_model(architecture: str, **kwargs):
    return __all_models__[architecture](**kwargs)
