"""Native VoxelDetector (DCF detector) + PTv3-path segmenter."""

import numpy as np

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.metrics.models.detector import (
    VoxelDetector,
    decode_boxes,
    predict,
)

TINY = dict(
    point_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
    voxel_size=0.5,
    max_voxels=512,
    num_classes=4,
)


def _cloud(P=1024, n=600, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((P, 4), np.float32)
    pts[:n, :2] = rng.uniform(-7, 7, (n, 2))
    pts[:n, 2] = rng.uniform(-1.5, 1.5, n)
    pts[:n, 3] = rng.rand(n)
    return jnp.asarray(pts), jnp.asarray(np.arange(P) < n)


def test_decode_boxes_identity():
    anchors = jnp.asarray(np.array([[1.0, 2, -1, 4, 2, 1.5, 0.3]]))
    out = np.asarray(decode_boxes(jnp.zeros((1, 7)), anchors))
    np.testing.assert_allclose(out, np.asarray(anchors), rtol=1e-6)


def test_anchor_grid_shape_and_centers():
    model = VoxelDetector(**TINY)
    Hb, Wb = model.bev_shape
    assert (Hb, Wb) == (4, 4)  # 16/0.5 = 32 → /8
    a = model.anchors()
    assert a.shape == (4, 4, 8, 7)  # 2 rotations x 4 classes
    assert abs(a[0, 0, 0, 0] - (-6.0)) < 1e-5  # first cell center x
    assert abs(a[0, 0, 0, 1] - (-6.0)) < 1e-5


def test_detector_forward_and_predict():
    model = VoxelDetector(**TINY)
    pts, mask = _cloud()
    params = model.init(jax.random.PRNGKey(0), pts, mask)
    out = model.apply(params, pts, mask)
    A = 4 * 4 * 8
    assert out["boxes"].shape == (A, 7)
    assert out["scores"].shape == (A, 4)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    s = np.asarray(out["scores"])
    assert (s >= 0).all() and (s <= 1).all()

    boxes, scores, labels, keep = predict(
        model, params, pts, mask, score_thresh=0.0, max_dets=16
    )
    assert boxes.shape == (16, 7) and keep.dtype == bool
    kept = np.asarray(boxes)[np.asarray(keep)]
    assert np.isfinite(kept).all()
    # scores sorted descending over the candidate list
    sc = np.asarray(scores)
    assert (np.diff(sc) <= 1e-6).all()


def test_segment_cloud_native_path():
    from lidarcrafter_tpu.metrics.extractor.sparse_unet import MinkowskiNet
    from lidarcrafter_tpu.metrics.models.ptv3 import segment_cloud

    mink = MinkowskiNet(
        layer_num=(8,) * 9, cr=1.0, input_dims=4, num_classes=17,
        voxel_size=0.5, max_voxels=256,
    )
    rng = np.random.RandomState(1)
    pts = rng.uniform(-5, 5, (300, 4)).astype(np.float32)
    dummy = (jnp.zeros((512, 3)), jnp.zeros((512, 4)), jnp.ones((512,), bool))
    params = mink.init(jax.random.PRNGKey(0), *dummy)
    pred, colors = segment_cloud(mink, params, pts, max_points=512)
    assert pred.shape == (300,)
    assert colors.shape == (300, 3) and colors.dtype == np.uint8
    assert pred.min() >= 0 and pred.max() <= 16
    # points sharing a voxel share a label
    vox = np.floor(pts[:, :3] / 0.5).astype(int)
    key = (vox - vox.min(0)) @ np.array([10000, 100, 1])
    for k in np.unique(key)[:20]:
        sel = key == k
        assert len(np.unique(pred[sel])) == 1
