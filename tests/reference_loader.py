"""Load individual reference (PyTorch) modules by file path for parity tests.

We never import the reference's packages wholesale (heavy CUDA deps); instead
specific files are loaded standalone with stubbed relative imports.  Reference
code itself is never copied into this repo — it is only *executed* in tests to
produce golden values.
"""

import importlib.util
import sys
import types
from pathlib import Path

REF = Path("/root/reference")


def _load(path: Path, name: str, package: str | None = None):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_lidar():
    """lidargen/utils/lidar.py (torch, numpy only)."""
    return _load(REF / "lidargen/utils/lidar.py", "ref_lidar")


def load_ref_common():
    """lidargen/dataset/transforms_3d/common.py (numpy, scipy only)."""
    return _load(REF / "lidargen/dataset/transforms_3d/common.py", "ref_common")


def load_ref_diffusion():
    """lidargen/models/diffusion/{base,continuous_time}.py as a package."""
    pkg = types.ModuleType("refdiff")
    pkg.__path__ = [str(REF / "lidargen/models/diffusion")]
    sys.modules["refdiff"] = pkg
    base = _load(REF / "lidargen/models/diffusion/base.py", "refdiff.base")
    pkg.base = base
    ct = _load(
        REF / "lidargen/models/diffusion/continuous_time.py", "refdiff.continuous_time"
    )
    pkg.continuous_time = ct
    return ct


def load_ref_encoding():
    """lidargen/models/unets/encoding.py (torch only)."""
    return _load(REF / "lidargen/models/unets/encoding.py", "ref_encoding")


def load_ref_unet_ops():
    """lidargen/models/unets/ops.py (torch, einops only)."""
    return _load(REF / "lidargen/models/unets/ops.py", "ref_unet_ops")
