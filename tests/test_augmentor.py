"""Augmentor: flip/rotation/scaling parity vs reference, GT-paste collisions."""

import numpy as np

from lidarcrafter_tpu.datasets.augmentor import (
    DataAugmentor,
    GTDatabaseSampler,
    global_rotation,
    global_scaling,
    random_flip_along_x,
    random_flip_along_y,
)
from tests.reference_loader import REF, _load


def _load_ref_utils():
    import sys
    import types

    # augmentor_utils imports ...utils common_utils relatively? check: it uses
    # `from . import common_utils`-style? Load with stub package context.
    spec_common = REF / "lidargen/utils/common_utils.py"
    import importlib.util

    # augmentor_utils imports `from ...utils import common_utils`
    pkg = types.ModuleType("refaug")
    pkg.__path__ = [str(REF / "lidargen/dataset/augmentor")]
    sys.modules["refaug"] = pkg
    src = (REF / "lidargen/dataset/augmentor/augmentor_utils.py").read_text()
    src = src.replace("from ...utils import common_utils", "import ref_common_utils as common_utils")
    # box_utils pulls the CUDA roiaware extension; the parity targets
    # (flip/rotation/scaling) never call it
    src = src.replace("from ...utils import box_utils", "box_utils = None")
    # common_utils imports SharedArray (GT-database mmap helper) at module
    # scope; the parity targets (flip/rotation/scaling) never touch it — stub
    # it so the parity assertions actually execute.
    sys.modules.setdefault("SharedArray", types.ModuleType("SharedArray"))
    cu_spec = importlib.util.spec_from_file_location("ref_common_utils", spec_common)
    cu = importlib.util.module_from_spec(cu_spec)
    sys.modules["ref_common_utils"] = cu
    cu_spec.loader.exec_module(cu)
    mod = types.ModuleType("ref_augmentor_utils")
    exec(compile(src, "augmentor_utils.py", "exec"), mod.__dict__)
    return mod


ref_aug = _load_ref_utils()


def _scene(seed=0):
    rng = np.random.RandomState(seed)
    boxes = rng.randn(5, 9)
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 1
    points = rng.randn(100, 4)
    return boxes, points


def test_flip_parity():
    for fn_ours, fn_ref in (
        (random_flip_along_x, ref_aug.random_flip_along_x),
        (random_flip_along_y, ref_aug.random_flip_along_y),
    ):
        b, p = _scene()
        gb, gp, _ = fn_ours(b.copy(), p.copy(), enable=True)
        rb, rp = fn_ref(b.copy(), p.copy(), enable=True)
        np.testing.assert_allclose(gb, rb)
        np.testing.assert_allclose(gp, rp)


def test_rotation_scaling_parity():
    b, p = _scene(1)
    gb, gp, _ = global_rotation(b.copy(), p.copy(), [0.3, 0.3], noise_rotation=0.3)
    rb, rp = ref_aug.global_rotation(b.copy(), p.copy(), [0.3, 0.3], noise_rotation=0.3)
    np.testing.assert_allclose(gb, rb, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gp, rp, rtol=1e-5, atol=1e-5)


def test_gt_sampler_collision_rejection():
    rng = np.random.RandomState(0)
    scene_box = np.array([[0, 0, 0, 4, 2, 2, 0.0]])
    db = {
        "car": [
            # collides with the scene box → must be rejected
            {"box3d_lidar": np.array([0.5, 0, 0, 4, 2, 2, 0.0]),
             "num_points_in_gt": 100,
             "points": rng.randn(20, 4).astype(np.float32) * 0.3},
            # far away → accepted
            {"box3d_lidar": np.array([20, 20, 0, 4, 2, 2, 0.0]),
             "num_points_in_gt": 100,
             "points": rng.randn(20, 4).astype(np.float32) * 0.3},
        ]
    }
    sampler = GTDatabaseSampler(db, ["car"], {"car": 2}, rng=np.random.RandomState(1))
    dd = {
        "gt_boxes": scene_box.copy(),
        "gt_names": np.array(["car"]),
        "points": rng.randn(200, 4) * 30,
    }
    out = sampler(dd)
    assert out["gt_boxes"].shape[0] == 2  # exactly one accepted
    np.testing.assert_allclose(out["gt_boxes"][1, :2], [20, 20])
    assert len(out["gt_names"]) == 2


def test_data_augmentor_queue():
    b, p = _scene(2)
    aug = DataAugmentor(
        [
            {"name": "random_world_flip", "along_axis_list": ["x"]},
            {"name": "random_world_rotation", "rot_range": [-0.4, 0.4]},
            {"name": "random_world_scaling", "scale_range": [0.95, 1.05]},
        ],
        class_names=["car"],
        rng=np.random.RandomState(3),
    )
    out = aug({"gt_boxes": b.copy(), "points": p.copy(), "gt_names": np.array(["car"] * 5)})
    assert out["gt_boxes"].shape == b.shape
    # headings wrapped into [-pi, pi)
    assert (np.abs(out["gt_boxes"][:, 6]) <= np.pi).all()
