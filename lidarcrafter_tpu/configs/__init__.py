"""Named config registry mirroring ``lidargen/utils/configs/__init__.py:17-33``.

Keys match the reference exactly so CLIs and checkpoints can address the same
experiments; ``__all__[name]()`` returns an :class:`ExperimentConfig`.
"""

from . import experiments as E
from .common import ExperimentConfig  # noqa: F401

__all__ = {
    "kitti-360": E.kitti_360,
    "nuscenes-unet-uncond": E.nusc_unet_uncond,
    "nuscenes-hdit-uncond": E.nusc_hdit_uncond,
    "nuscenes-auto-reg": E.nusc_auto_reg,
    "nuscenes-auto-reg-v2": E.nusc_auto_reg_v2,
    "nuscenes-box-layout": E.nusc_box_layout,
    "nuscenes-box-layout-v1": E.nusc_box_layout_v1,
    "nuscenes-box-layout-v2": E.nusc_box_layout_v2,
    "nuscenes-box-layout-v3": E.nusc_box_layout_v3,
    "nuscenes-box-layout-v4": E.nusc_box_layout_v4,
    "nuscenes-box-layout-v5": E.nusc_box_layout_v5,
    "nuscenes-box-layout-v6": E.nusc_box_layout_v6,
    "meanflow-nusc": E.meanflow_nusc,
    "nuscenes-layout": E.nusc_layout,
    "nuscenes-object": E.nusc_object,
}


def get_config(name: str):
    return __all__[name]()
