"""Scene-graph construction rules, assigner edits, and collation."""

import numpy as np
import pytest

from lidarcrafter_tpu.datasets.scene_graph import (
    RELATIONSHIPS,
    SceneGraphAssigner,
    build_scene_graph_info,
    cal_box_relationships,
    collate_scene_graphs,
    pack_boxes_with_trajs,
    unique_names,
)
from tests.reference_loader import REF, _load


def test_relationship_rules_parity():
    import sys
    import types

    # stub the heavy pcdet dependency imported at module level
    pcdet = types.ModuleType("pcdet")
    utils = types.ModuleType("pcdet.utils")
    box_utils = types.ModuleType("pcdet.utils.box_utils")
    box_utils.mask_boxes_outside_range_numpy = lambda *a, **k: None
    sys.modules.setdefault("pcdet", pcdet)
    sys.modules.setdefault("pcdet.utils", utils)
    sys.modules.setdefault("pcdet.utils.box_utils", box_utils)
    ref = _load(REF / "tools/data_converter/prepare_nusc_layout_dataset.py", "ref_prep")
    rng = np.random.RandomState(0)
    for _ in range(50):
        a = rng.uniform(-20, 20, 9)
        b = rng.uniform(-20, 20, 9)
        a[3:6] = np.abs(a[3:6]) + 0.5
        b[3:6] = np.abs(b[3:6]) + 0.5
        for ego in (False, True):
            assert cal_box_relationships(a, b, ego) == ref.cal_box_relationships(
                a.copy(), b.copy(), ego
            )


def _info(n=4, seed=0):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((n, 7))
    boxes[:, :2] = rng.uniform(-30, 30, (n, 2))
    boxes[:, 2] = rng.uniform(-2, 1, n)
    boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
    names = np.array(["car", "truck", "pedestrian", "car"][:n])
    return {
        "gt_boxes": boxes,
        "gt_names": names,
        "num_lidar_pts": np.full(n, 100),
        "gt_agent_fut_trajs": rng.randn(n, 6, 2),
        "gt_agent_fut_masks": np.ones((n, 6)),
        "gt_agent_fut_states": np.array(["Stop"] * n),
        "instance_inds": np.arange(n),
        "gt_ego_fut_trajs": rng.randn(6, 2),
        "gt_ego_fut_masks": np.ones(6),
        "gt_ego_fut_state": "Go straight",
        "lidar_path": "x.bin",
    }


def test_build_scene_graph_info():
    info = build_scene_graph_info(_info())
    sg = info["scene_graph"]
    assert sg["valid"]
    assert sg["keep_box_names"][0] == "ego"
    assert sg["keep_box"].shape == (5, 7)
    rels = np.asarray(sg["keep_box_relationships"])
    # every subject index ≥ 1 (ego can only be object), preds in range
    assert (rels[:, 0] >= 1).all()
    assert (rels[:, 1] < len(RELATIONSHIPS)).all()
    assert sg["keep_agent_fut_trajs"].shape == (5, 6, 2)
    # out-of-range boxes drop to invalid
    far = _info()
    far["gt_boxes"][:, 0] = 500.0
    assert not build_scene_graph_info(far)["scene_graph"]["valid"]


def test_unique_names_and_packing():
    assert unique_names(["car", "truck", "car"]) == ["car1", "truck", "car2"]
    boxes = np.random.RandomState(0).rand(3, 8)
    trajs = np.random.RandomState(1).rand(3, 6, 2)
    masks = np.ones((3, 6))
    packed = pack_boxes_with_trajs(boxes, trajs, masks)
    assert packed.shape == (3, 40)
    np.testing.assert_allclose(packed[0, 20:28], 0.0)  # ego box masked
    np.testing.assert_allclose(packed[1:, 20:28], 1.0)


def _assigner_sample(seed=1):
    info = build_scene_graph_info(_info())
    sg = info["scene_graph"]
    from lidarcrafter_tpu.datasets.transforms import scale_boxes_3d

    rng = np.random.RandomState(seed)
    data_dict = {
        "scaled_gt_boxes": scale_boxes_3d(sg["keep_box"].copy()),
        "gt_fut_trajs": sg["keep_agent_fut_trajs"],
        "gt_fut_masks": sg["keep_agent_fut_masks"],
        "gt_names": sg["keep_box_names"],
        "gt_fut_states": sg["keep_agent_fut_states"],
        "gt_box_relationships": sg["keep_box_relationships"],
    }
    return data_dict


def test_assigner_and_collate():
    fake_clip = lambda words: np.random.RandomState(42).randn(len(words), 512)
    assigner = SceneGraphAssigner(
        split="train", text_encode_fn=fake_clip, rng=np.random.RandomState(3)
    )
    items = [assigner.assign_item(i, _assigner_sample(i)) for i in range(3)]
    batch = collate_scene_graphs(items)
    enc = batch["encoder"]
    n_nodes = len(enc["objs"])
    assert enc["boxes"].shape == (n_nodes, 40)
    assert enc["text_feats"].shape == (n_nodes, 512)
    assert enc["tripltes"].shape[1] == 3
    assert enc["rel_feats"].shape[0] == enc["tripltes"].shape[0]
    # triples index into the global node range, scene-monotonic
    assert enc["tripltes"][:, [0, 2]].max() < n_nodes
    assert (np.diff(enc["obj_to_scene"]) >= 0).all()
    # decoder keeps all nodes even when encoder had a removal
    assert len(batch["decoder"]["objs"]) >= n_nodes


def test_assigner_edits_consistent():
    fake_clip = lambda words: np.ones((len(words), 512), np.float32)
    assigner = SceneGraphAssigner(
        split="train", text_encode_fn=fake_clip, rng=np.random.RandomState(0)
    )
    saw_addition = saw_rel = False
    for i in range(20):
        out = assigner.assign_item(i, _assigner_sample(i))
        enc, dec = out["encoder"], out["decoder"]
        if out["manipulate"]["type"] == "addition":
            saw_addition = True
            assert len(enc["objs"]) == len(dec["objs"]) - 1
            # edited graph stays self-consistent
            tr = np.asarray(enc["triples"]).reshape(-1, 3)
            assert tr[:, [0, 2]].max() < len(enc["objs"])
            assert len(enc["rel_feats"]) == len(enc["triples"])
        elif out["manipulate"]["type"] == "relationship":
            saw_rel = True
            idx, (s, p, o) = out["manipulate"]["original_relship"]
            assert enc["triples"][idx][1] != p or True
    assert saw_addition and saw_rel
