"""Dataset / conditioning layer (L2), mirroring ``lidargen/dataset``.

Registry keys cf. ``lidargen/dataset/__init__.py:6-11``.
"""

from . import transforms  # noqa: F401
from .nuscenes import NuscDataset  # noqa: F401
from .object_dataset import NuscObjectDataset  # noqa: F401
from .custom_dataset import CustomDataset  # noqa: F401
from .temporal_dataset import NuscTempDataset  # noqa: F401

__all_datasets__ = {
    "nuscenes": NuscDataset,
    "nuscenes-object": NuscObjectDataset,
    "custom": CustomDataset,
    "nuscenes-temporal": NuscTempDataset,
}
