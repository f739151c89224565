"""Model zoo registry, mirroring ``lidargen/models/unets/__init__.py:15-30``.

Keys match the reference so configs and checkpoints can drive the TPU backend
unchanged.  Entries are appended as each family lands.
"""

from .hdit import HDiT
from .easy_unet import Identity, SpatialRescaler
from .efficient_unet import EfficientUNet, EfficientUNetCond, MFEfficientUNet
from .layout_encoder import LayoutTransformerEncoder, LayoutTransformerEncoderV5
from .layout_unet import LayoutUnet, LayoutUnetV1
from .openai_unet import OpenAIUNet
from .point_unet import ObjectGenEncoder, PointUNet
from .scene_graph import SceneGraph
from .refinenet import LiDARGenRefineNet
from .unet_1d import UNet1DModel

__all_models__ = {
    "efficient_unet": EfficientUNet,
    "efficient_unet_cond": EfficientUNetCond,
    "mf_efficient_unet": MFEfficientUNet,
    "layout_encoder": LayoutTransformerEncoder,
    "layout_encoder_v5": LayoutTransformerEncoderV5,
    "layout_unet_v1": LayoutUnetV1,
    # faithful v0: plain convs + ADM nearest/avg-pool resampling (layout_unet.py)
    "layout_unet": LayoutUnet,
    "unet_1d": UNet1DModel,
    "scene_graph": SceneGraph,
    "object_gen_encoder": ObjectGenEncoder,
    "point_unet": PointUNet,
    "hdit": HDiT,
    "refinenet": LiDARGenRefineNet,
    "openai_unet": OpenAIUNet,
    "easy_unet": SpatialRescaler,
    "identity": Identity,
}


def build_model(architecture: str, **kwargs):
    return __all_models__[architecture](**kwargs)
