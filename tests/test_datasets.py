"""Dataset transforms + rollout warps: parity vs reference numpy/torch code."""

import numpy as np
import pytest

import jax.numpy as jnp

from lidarcrafter_tpu.datasets import transforms as T
from lidarcrafter_tpu.datasets import rollout as R
from lidarcrafter_tpu.datasets.custom_dataset import CustomDataset
from tests.reference_loader import REF, _load

ref_common_vis = _load(REF / "tools/vis_tools/utils/common.py", "ref_vis_common")
ref_ds_utils = _load(REF / "lidargen/dataset/utils.py", "ref_ds_utils")


def test_rotate_points_parity():
    rng = np.random.RandomState(0)
    pts = rng.randn(2, 50, 4).astype(np.float32)
    ang = rng.randn(2).astype(np.float32)
    want = ref_ds_utils.rotate_points_along_z(pts.copy(), ang)
    got = T.rotate_points_along_z(pts.copy(), ang)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    got_j = np.asarray(R.rotate_points_along_z_jnp(jnp.asarray(pts), jnp.asarray(ang)))
    np.testing.assert_allclose(got_j, want, rtol=1e-4, atol=1e-4)


def test_scale_unscale_roundtrip():
    rng = np.random.RandomState(1)
    n = 7
    boxes = np.zeros((n, 7))
    boxes[:, :2] = rng.uniform(-60, 60, (n, 2))
    boxes[:, 2] = rng.uniform(-4, 4, n)
    boxes[:, 3:6] = rng.uniform(0.5, 8, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scaled = T.scale_boxes_3d(boxes.copy())
    assert scaled.shape == (n, 8)
    trajs = rng.randn(n, 12)
    packed = np.concatenate([scaled, trajs], axis=1)
    unscaled, out_trajs = T.unscale_boxes_3d(packed)
    # row 0 zeroed by convention (ego)
    np.testing.assert_allclose(unscaled[1:], boxes[1:], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_trajs.reshape(n, 12), trajs, atol=1e-9)


def test_norm_unnorm_fg_points_roundtrip():
    """GT-database object points are stored box-centered (world orientation):
    norm de-rotates+scales; unnorm re-places them at the box in world frame,
    so unnorm(norm(p)) == p + box_center."""
    rng = np.random.RandomState(2)
    box = np.array([5.0, -3.0, 0.5, 4.0, 2.0, 1.6, 0.7])
    pts = np.concatenate(
        [rng.uniform(-0.5, 0.5, (30, 3)), rng.uniform(0, 255, (30, 1))], axis=1
    )
    normed = T.norm_fg_points(pts.copy(), box)
    assert np.abs(normed[:, :3]).max() <= 1.5
    restored = T.unnorm_fg_points(normed, box)
    want = pts.copy()
    want[:, :3] += box[:3]
    np.testing.assert_allclose(restored, want, rtol=1e-5, atol=1e-4)


def test_align_box_num():
    b3 = np.ones((3, 9))
    b2 = np.ones((3, 4))
    fe = np.ones((3, 8))
    o3, o2, oe, v = T.align_box_num(b3, b2, fe, expect_box_num=13)
    assert o3.shape == (13, 9) and v.sum() == 3
    o3, o2, oe, v = T.align_box_num(np.ones((20, 9)), np.ones((20, 4)), np.ones((20, 8)))
    assert o3.shape == (13, 9) and v.sum() == 13


def test_warp_lidar_future_parity():
    rng = np.random.RandomState(3)
    P = rng.uniform(-20, 20, (100, 4)).astype(np.float32)
    future_xy = np.cumsum(rng.uniform(0.5, 2.0, (5, 2)), axis=0).astype(np.float32)
    want = ref_common_vis.warp_lidar_future(P.copy(), future_xy.copy())
    got = np.asarray(R.warp_lidar_future(jnp.asarray(P), jnp.asarray(future_xy)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_warp_boxes_future_parity():
    rng = np.random.RandomState(4)
    K, N = 4, 6
    boxes0 = np.zeros((K, 7), np.float32)
    boxes0[:, :2] = rng.uniform(-30, 30, (K, 2))
    boxes0[:, 2] = rng.uniform(-2, 1, K)
    boxes0[:, 3:6] = rng.uniform(1, 5, (K, 3))
    boxes0[:, 6] = rng.uniform(-np.pi, np.pi, K)
    traj_obj = np.cumsum(rng.uniform(-1, 1, (K, N, 2)), axis=1).astype(np.float32)
    traj_ego = np.cumsum(rng.uniform(0.5, 1.5, (N, 2)), axis=0).astype(np.float32)
    want = ref_common_vis.warp_boxes_future(boxes0.copy(), traj_obj.copy(), traj_ego.copy(), 0.0)
    got = np.asarray(
        R.warp_boxes_future(jnp.asarray(boxes0), jnp.asarray(traj_obj), jnp.asarray(traj_ego))
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_inter_frame_transforms_parity():
    rng = np.random.RandomState(5)
    future_xy = np.cumsum(rng.uniform(0.5, 2.0, (6, 2)), axis=0)
    want = ref_common_vis.compute_inter_frame_transforms(future_xy.copy())
    got = R.compute_inter_frame_transforms(future_xy.copy())
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_split_replay_roundtrip():
    """Points in a box, aligned then replayed at the same box == original."""
    rng = np.random.RandomState(6)
    box = np.array([[3.0, 2.0, 0.0, 4.0, 2.0, 2.0, 0.5]], np.float32)
    inside = np.concatenate(
        [box[0, :3] + rng.uniform(-0.4, 0.4, (40, 3)), rng.rand(40, 1)], axis=1
    ).astype(np.float32)
    outside = np.concatenate(
        [rng.uniform(20, 30, (20, 3)), rng.rand(20, 1)], axis=1
    ).astype(np.float32)
    pts = np.concatenate([inside, outside]).astype(np.float32)
    mask = np.ones(60, bool)
    bg_mask, obj_pts, obj_mask = R.split_foreground_background(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(box), jnp.ones(1, bool),
        max_points_per_obj=64,
    )
    assert int(jnp.sum(obj_mask)) == 40
    assert int(jnp.sum(bg_mask)) == 20
    placed, placed_mask = R.replay_objects(
        obj_pts, obj_mask, jnp.asarray(box), jnp.ones(1, bool)
    )
    got = np.asarray(placed[0])[np.asarray(placed_mask[0])]
    np.testing.assert_allclose(np.sort(got, axis=0), np.sort(inside, axis=0), atol=1e-4)


def test_transform_points_homogeneous():
    pts = np.array([[1.0, 0, 0, 9.0]], np.float32)
    T44 = np.eye(4)
    T44[:3, 3] = [1, 2, 3]
    out = np.asarray(R.transform_points_homogeneous(jnp.asarray(pts), jnp.asarray(T44)))
    np.testing.assert_allclose(out[0], [2, 2, 3, 9], atol=1e-6)


def test_custom_dataset_pipeline():
    """End-to-end conditioning from in-memory dicts (projection + masks)."""
    rng = np.random.RandomState(7)
    r = rng.uniform(3, 60, 5000)
    az = rng.uniform(-np.pi, np.pi, 5000)
    el = rng.uniform(np.deg2rad(-25), np.deg2rad(5), 5000)
    pts = np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el),
         rng.uniform(0, 255, 5000)], axis=1,
    ).astype(np.float32)
    boxes = np.zeros((3, 7), np.float32)
    boxes[1:, 0] = [10, -15]
    boxes[1:, 1] = [5, 2]
    boxes[1:, 3:6] = 3.0
    info = {"points": pts, "gt_boxes": boxes, "gt_names": ["ego", "car", "truck"]}
    ds = CustomDataset(custom_box_infos=[info])
    sample = ds[0]
    H, W = ds.resolution
    assert sample["depth"].shape == (H, W, 1)
    assert sample["scaled_gt_boxes"].shape == (13, 9)
    assert sample["is_valid_obj"].sum() == 2
    assert sample["condition_mask"].shape == (H, W, 2)
    assert np.isfinite(sample["scene_loss_weight_map"]).all()
    batch = ds.collate_fn([sample, sample])
    assert batch["depth"].shape == (2, H, W, 1)
    assert batch["batch_size"] == 2


def test_expand_future_trajs():
    # two agents (ego + 1 object), 6-step deltas
    deltas = np.ones((2, 6, 2), np.float32) * 0.5
    ego, obj = R.expand_future_trajs(deltas)
    assert ego.shape == (6, 2) and obj.shape == (1, 6, 2)
    np.testing.assert_allclose(ego[-1], [3.0, 3.0], atol=1e-6)
    ego16, obj16 = R.expand_future_trajs(deltas, M=16)
    assert ego16.shape == (15, 2) and obj16.shape == (1, 15, 2)


def test_interp_trajs_matches_np_interp():
    """The vectorized lerp equals per-axis np.interp on a uniform grid
    (the reference's ``interp_trajs_numpy``, pipe_related.py:229-241)."""
    r = np.random.RandomState(1)
    for K, N, M in [(3, 7, 16), (1, 2, 5), (2, 5, 3), (2, 1, 4)]:
        t = r.randn(K, N, 2).astype(np.float32)
        got = R.interp_trajs(t, M)
        t_orig = np.linspace(0, 1, N)
        t_new = np.linspace(0, 1, M)
        want = np.stack([
            np.stack([np.interp(t_new, t_orig, t[k, :, d]) for d in range(2)], -1)
            for k in range(K)
        ]).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        assert got.dtype == np.float32


def test_temporal_dataset_with_synthetic_files(tmp_path):
    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.datasets.temporal_dataset import NuscTempDataset

    rng = np.random.RandomState(0)

    def make_bin(name):
        r = rng.uniform(3, 50, 2000)
        az = rng.uniform(-np.pi, np.pi, 2000)
        el = rng.uniform(-0.4, 0.15, 2000)
        pts = np.stack(
            [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az),
             r * np.sin(el), rng.uniform(0, 255, 2000), np.zeros(2000)], 1,
        ).astype(np.float32)
        # guarantee some points inside the fg box at (10, 5, 0)
        pts[:50, :3] = np.array([10, 5, 0]) + rng.uniform(-0.5, 0.5, (50, 3))
        pts.tofile(tmp_path / name)
        return name

    def info(token, prev_token=None):
        boxes = np.zeros((2, 7))
        boxes[1] = [10, 5, 0, 4, 2, 2, 0.3]
        return {
            "token": token,
            "lidar_path": make_bin(f"{token}.bin"),
            "prev_info": {
                "valid": prev_token is not None,
                "token": prev_token,
                "sensor2lidar_rotation": np.eye(3),
                "sensor2lidar_translation": np.array([1.0, 0, 0]),
            },
            "scene_graph": {
                "valid": True,
                "keep_box_names": np.array(["ego", "car"]),
                "keep_box": boxes,
            },
        }

    cfg = get_config("nuscenes-unet-uncond")
    cfg.data.data_root = str(tmp_path)
    cfg.data.resolution = (16, 64)
    infos = [info("a"), info("b", prev_token="a")]
    ds = NuscTempDataset(cfg, infos=infos)
    assert len(ds) == 1  # only 'b' has a valid prev
    sample = ds[0]
    assert sample["depth"].shape == (16, 64, 1)
    assert sample["prev_cond"].shape == (16, 64, 7)  # xyz+int+label+depth+mask
    labels = sample["prev_cond"][..., 4]
    assert labels.max() >= 1  # some fg pixels labeled
