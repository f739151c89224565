"""Named config registry mirroring ``lidargen/utils/configs/__init__.py:17-33``.

Keys match the reference exactly so CLIs and checkpoints can address the same
experiments.  Entries are populated as each branch lands; ``__all__[name]()``
returns a config object.
"""

from .option_unet_nusc import NUSC_Config

__all__ = {
    "nuscenes-unet-uncond": NUSC_Config,
}


def get_config(name: str):
    return __all__[name]()
