"""Data-converter math (step 1/5/6 cores) + map geometry helpers."""

import numpy as np

from lidarcrafter_tpu.datasets.converter import (
    agent_future_offsets,
    assemble_gt_boxes,
    classify_motion,
    ego_future_to_lidar,
    geom2anno,
    local_coords_to_global,
    quaternion_to_matrix,
    quart_to_rpy,
    split_object_dataset,
    velocity_global_to_lidar,
)
from lidarcrafter_tpu.datasets.map_extractor import (
    aligned_groups,
    clip_polyline_to_box,
    ensure_orientation,
    is_ccw,
    rect_direction,
)


def test_quaternion_to_matrix_yaw():
    th = 0.7
    q = np.array([np.cos(th / 2), 0, 0, np.sin(th / 2)])  # wxyz, yaw=th
    R = quaternion_to_matrix(q)
    want = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    np.testing.assert_allclose(R, want, atol=1e-9)
    r, p, y = quart_to_rpy([0, 0, np.sin(th / 2), np.cos(th / 2)])  # xyzw
    np.testing.assert_allclose([r, p, y], [0, 0, th], atol=1e-9)


def test_velocity_global_to_lidar_inverts_rotations():
    th = np.pi / 3
    e2g = quaternion_to_matrix([np.cos(th / 2), 0, 0, np.sin(th / 2)])
    l2e = np.eye(3)
    # a velocity pointing along global heading th maps to lidar +x
    v = np.array([[np.cos(th), np.sin(th)]])
    out = velocity_global_to_lidar(v, e2g, l2e)
    np.testing.assert_allclose(out, [[1.0, 0.0]], atol=1e-9)


def test_assemble_gt_boxes_reorders_dims():
    out = assemble_gt_boxes(
        np.array([[1.0, 2, 3]]), np.array([[2.0, 5.0, 1.5]]), np.array([0.3])
    )
    np.testing.assert_allclose(out, [[1, 2, 3, 5.0, 2.0, 1.5, 0.3]])


def test_classify_motion_thresholds():
    straight = np.stack([np.zeros(6), np.linspace(0, 5, 6)], 1)
    assert classify_motion(straight) == "Go Straight"
    right = np.stack([np.linspace(0, 3, 6), np.linspace(0, 5, 6)], 1)
    assert classify_motion(right) == "Turn Right"
    left = np.stack([np.linspace(0, -3, 6), np.linspace(0, 5, 6)], 1)
    assert classify_motion(left) == "Turn Left"
    assert classify_motion(np.zeros((6, 2))) == "Stop"
    assert classify_motion(np.zeros((0, 2))) == "Unkonwn"


def test_agent_future_offsets_roundtrip():
    center = np.array([10.0, 20.0, 0.0])
    scene = np.array([[11.0, 20.0], [12.5, 20.5], [13.0, 22.0]])
    trajs, mask = agent_future_offsets(scene, center, fut_ts=5)
    np.testing.assert_allclose(mask, [1, 1, 1, 0, 0])
    # cumulative sum of offsets recovers the scene trajectory
    np.testing.assert_allclose(center[:2] + np.cumsum(trajs[:3], 0), scene)


def test_local_to_global_then_offsets():
    th = np.pi / 2
    R = quaternion_to_matrix([np.cos(th / 2), 0, 0, np.sin(th / 2)])
    local = np.array([[1.0, 0.0]])  # +x in agent frame
    out = local_coords_to_global(local, np.array([5.0, 5.0, 0.0]), R)
    np.testing.assert_allclose(out, [[5.0, 6.0]], atol=1e-9)


def test_ego_future_to_lidar_straight():
    # ego drives +y in its own frame (identity pose), command = straight
    glob = np.stack([np.zeros(4), np.arange(4.0), np.zeros(4)], 1)
    trajs, cmd, state = ego_future_to_lidar(
        glob, np.zeros(3), [1, 0, 0, 0], np.zeros(3), [1, 0, 0, 0]
    )
    assert state == "Go Straight"
    np.testing.assert_allclose(cmd, [0, 0, 1])
    np.testing.assert_allclose(trajs, [[0, 1, 0]] * 3, atol=1e-9)


def test_geom2anno_labels():
    anno = geom2anno(
        {"divider": [np.zeros((3, 2))], "ped_crossing": [], "ignored": [1]}
    )
    assert set(anno) == {0, 1}
    assert anno[1][0].shape == (3, 2)


def test_split_object_dataset():
    rng = np.random.RandomState(0)
    db = {
        name: [
            {"num_points_in_gt": int(n), "cls": name}
            for n in rng.randint(0, 200, 40)
        ]
        for name in ("car", "truck", "bus", "pedestrian", "barrier")
    }
    train, val = split_object_dataset(db, sample_num=20, min_points=50)
    assert all(s["num_points_in_gt"] > 50 for s in train + val)
    n = len(train) + len(val)
    assert len(train) > len(val)
    # positives capped at 20 each, negatives share the budget
    assert n <= 3 * 20 + 2 * 10


# ---------------------------------------------------------------- map geometry


def test_ring_orientation():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
    assert is_ccw(sq)
    cw = ensure_orientation(sq, ccw=False)
    assert not is_ccw(cw)
    np.testing.assert_allclose(ensure_orientation(sq, ccw=True), sq)


def test_clip_polyline_to_box():
    line = np.array([[-2.0, 0.5], [2.0, 0.5]])  # crosses the unit box
    pieces = clip_polyline_to_box(line, 0, 0, 1, 1)
    assert len(pieces) == 1
    np.testing.assert_allclose(pieces[0], [[0, 0.5], [1, 0.5]])
    # polyline fully outside → nothing
    assert clip_polyline_to_box(np.array([[5.0, 5], [6, 6]]), 0, 0, 1, 1) == []
    # zig-zag leaving and re-entering → two pieces
    zz = np.array([[0.2, 0.5], [1.5, 0.5], [1.5, 0.8], [0.2, 0.8]])
    assert len(clip_polyline_to_box(zz, 0, 0, 1, 1)) == 2


def test_rect_direction_and_groups():
    rng = np.random.RandomState(1)
    th = 0.4
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    rect = (rng.rand(200, 2) * [6.0, 1.0]) @ R.T  # long axis at angle th
    v, n = rect_direction(rect)
    ang = np.arctan2(*v[::-1]) % np.pi
    assert abs(ang - th) < 0.05 and abs(n - 6.0) < 0.5
    dirs = [(np.array([np.cos(a), np.sin(a)]), 1.0) for a in (0.0, 0.02, 1.2)]
    groups = aligned_groups(dirs)
    assert sorted(map(sorted, groups)) == [[0, 1], [2]]


def test_add_lidarseg_patch():
    """gt_segment_path patching against a fake devkit
    (add_lidarseg_token.py:15-21 semantics)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.converters.add_lidarseg import patch_infos_with_lidarseg

    class FakeNusc:
        def get(self, table, token):
            if table == "sample":
                return {"data": {"LIDAR_TOP": f"sd_{token}"}}
            assert table == "lidarseg"
            if token == "sd_tok_nolabel":
                return None
            return {"filename": f"lidarseg/{token}.bin"}

    infos = [{"token": "tok_a"}, {"token": "tok_nolabel"}, {"token": "tok_b"}]
    n = patch_infos_with_lidarseg(infos, FakeNusc())
    assert n == 2
    assert infos[0]["gt_segment_path"] == "lidarseg/sd_tok_a.bin"
    assert "gt_segment_path" not in infos[1]
    assert infos[2]["gt_segment_path"] == "lidarseg/sd_tok_b.bin"
    # dict-wrapped infos ({"infos": [...]}) are accepted too
    wrapped = {"infos": [{"token": "tok_c"}]}
    assert patch_infos_with_lidarseg(wrapped, FakeNusc()) == 1
