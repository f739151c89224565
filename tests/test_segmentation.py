"""RangeNet semantic trainer pieces: seg dataset, class weights, LR schedule."""

import pickle

import numpy as np

import jax.numpy as jnp

from lidarcrafter_tpu.datasets.seg_dataset import (
    NUM_SEG_CLASSES,
    NuscSegDataset,
    seg_learning_lut,
)
from lidarcrafter_tpu.training.segmentation import (
    rangenet_class_weights,
    warmup_exp_decay_schedule,
    weighted_pixel_cross_entropy,
)


def test_seg_learning_lut():
    lut = seg_learning_lut()
    assert lut[0] == 0      # 'noise' → ignored(-1) + 1 = void
    assert lut[24] == 11    # drivable surface → 10 + 1
    assert lut[31] == 0
    assert lut.max() <= NUM_SEG_CLASSES - 1


def test_seg_dataset_projection(tmp_path):
    rng = np.random.RandomState(0)
    N = 500
    pts = np.zeros((N, 5), np.float32)
    ang = rng.uniform(-np.pi, np.pi, N)
    r = rng.uniform(5, 30, N)
    pts[:, 0] = r * np.cos(ang)
    pts[:, 1] = r * np.sin(ang)
    pts[:, 2] = rng.uniform(-2, 4, N)
    pts[:, 3] = rng.randint(0, 255, N)
    pts.tofile(tmp_path / "cloud.bin")
    labels = rng.randint(0, 32, N).astype(np.uint8)
    labels.tofile(tmp_path / "seg.bin")
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(
            [{"lidar_path": "cloud.bin", "gt_segment_path": "seg.bin"}], f
        )
    ds = NuscSegDataset(str(tmp_path / "infos.pkl"), str(tmp_path),
                        resolution=(32, 256))
    assert len(ds) == 1
    item = ds[0]
    assert item["segment"].shape == (32, 256)
    assert item["xyz"].shape == (32, 256, 3)
    # labels are valid training ids; empty pixels are void 0
    assert item["segment"].min() >= 0
    assert item["segment"].max() <= NUM_SEG_CLASSES - 1
    empty = item["mask"][..., 0] == 0
    assert (item["segment"][empty] == 0).all()
    batch = ds.collate_fn([item, item])
    x = ds.rangenet_input(batch)
    assert x.shape == (2, 32, 256, 5)


def test_rangenet_class_weights():
    w = np.asarray(rangenet_class_weights(17))
    assert w[0] == 0.0
    want = 1.0 / (1.0 / 16 + 0.001)
    np.testing.assert_allclose(w[1:], want, rtol=1e-5)


def test_warmup_exp_decay_schedule():
    s = warmup_exp_decay_schedule(0.01, warmup_steps=10, decay=0.99)
    np.testing.assert_allclose(float(s(0)), 0.0)
    np.testing.assert_allclose(float(s(5)), 0.005, rtol=1e-5)
    np.testing.assert_allclose(float(s(10)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(s(12)), 0.01 * 0.99**2, rtol=1e-5)


def test_void_class_carries_no_loss():
    logits = jnp.zeros((1, 2, 2, 3))
    labels = jnp.zeros((1, 2, 2), jnp.int32)  # all void
    w = jnp.array([0.0, 1.0, 1.0])
    loss = weighted_pixel_cross_entropy(logits, labels, w, ignore_index=-1)
    np.testing.assert_allclose(float(loss), 0.0)
