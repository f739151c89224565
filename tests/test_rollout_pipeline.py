"""Integration: tiny tri-branch 4D rollout end-to-end (2 sampling steps, 2 frames)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.diffusion import CondContinuousDiffusion
from lidarcrafter_tpu.models.layout_encoder import LayoutTransformerEncoder
from lidarcrafter_tpu.models.layout_unet import LayoutUnetV1
from lidarcrafter_tpu.pipeline import TemporalRollout
from lidarcrafter_tpu.utils.lidar import LiDARUtility

H, W, L = 32, 128, 13


def _branch(out_channels_enc, extra_in, seed):
    enc = LayoutTransformerEncoder(
        feature_map_size=(H, W), layout_length=L, hidden_dim=32, output_dim=128,
        num_layers=1, num_heads=4, use_final_ln=True,
        num_classes_for_layout_object=9, mask_size_for_layout_object=32,
        used_condition_types=("obj_class", "obj_bbox", "is_valid_obj"),
        resolution_to_attention=(4, 8), out_channels=out_channels_enc,
    )
    unet = LayoutUnetV1(
        in_channels=2 + out_channels_enc, resolution=(H, W), model_channels=32,
        out_channels=2, num_res_blocks=1, attention_ds=(4,), encoder_channels=32,
        channel_mult=(1, 2, 4, 8), num_head_channels=16, image_size=H,
        coords_encoding=None,
    )
    cond = {
        "scaled_gt_boxes": jnp.zeros((1, L, 9)),
        "gt_boxes_2d": jnp.zeros((1, L, 4)),
        "is_valid_obj": jnp.ones((1, L)),
        "concat_cond": jnp.zeros((1, H, W, 10)),
    }
    if extra_in:
        cond["autoregressive_cond"] = jnp.zeros((1, H, W, 1))
    enc_params = enc.init(jax.random.PRNGKey(seed), cond)
    layout = enc.apply(enc_params, cond)
    cd = {"time_condition": jnp.zeros((1,)), "other_condition": layout}
    unet_params = unet.init(jax.random.PRNGKey(seed + 1), jnp.zeros((1, H, W, 2)), cd)
    params = {"model": unet_params, "cond": enc_params}
    engine = CondContinuousDiffusion(
        apply_fn=lambda p, x, c: unet.apply(p["model"], x, c),
        cond_apply_fn=lambda p, d: enc.apply(p["cond"], d),
        sampling_shape=(H, W, 2),
        cond_mode="concat",
    )
    return engine, params


@pytest.mark.parametrize("mode", ["ddim", "dpmpp_2m"])
def test_temporal_rollout_smoke(mode):
    cond_engine, cond_params = _branch(10, extra_in=False, seed=0)
    auto_engine, auto_params = _branch(11, extra_in=True, seed=10)
    utils = LiDARUtility.create((H, W), "log_depth", 1.45, 80.0)

    pipeline = TemporalRollout(
        cond_engine=cond_engine, cond_params=cond_params,
        autoreg_engine=auto_engine, autoreg_params=auto_params,
        lidar_utils=utils, num_sampling_steps=2, sampling_mode=mode,
        max_points_per_obj=64,
    )

    rng = np.random.RandomState(0)
    K = 3
    boxes0 = np.zeros((K, 7), np.float32)
    boxes0[:, 0] = [10, -12, 20]
    boxes0[:, 1] = [4, -6, -2]
    boxes0[:, 3:6] = 3.0
    classes = np.arange(1, K + 1, dtype=np.float32)
    gt_fut_trajs = rng.uniform(0.1, 0.6, (K + 1, 6, 2)).astype(np.float32)

    first_batch = {
        "scaled_gt_boxes": jnp.asarray(rng.rand(1, L, 9).astype(np.float32)),
        "gt_boxes_2d": jnp.asarray(rng.rand(1, L, 4).astype(np.float32)),
        "is_valid_obj": jnp.ones((1, L)),
        "concat_cond": jnp.asarray(rng.rand(1, H, W, 10).astype(np.float32)),
    }

    frames = pipeline.rollout(
        first_batch, gt_fut_trajs, boxes0, classes,
        jax.random.PRNGKey(0), num_frames=2, interp_M=8,
    )
    assert len(frames) == 3
    for f in frames:
        assert f.shape == (1, H, W, 2)
        assert np.isfinite(f).all()

    # streaming delivery must be frame-exact vs the single-program path:
    # the chunk boundary only re-threads the (points, mask) carry
    streamed = pipeline.rollout(
        first_batch, gt_fut_trajs, boxes0, classes,
        jax.random.PRNGKey(0), num_frames=2, interp_M=8, stream_chunks=2,
    )
    assert len(streamed) == 3
    for a, b in zip(frames, streamed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --------------------------------------------------------- composed parity


def _load_ref_pipe_related():
    """Execute the reference ``pipe_related`` module itself (never copied):
    heavy imports (CUDA roiaware, PTv3, full dataset stack) are swapped for
    shims that are either executed reference functions or brute-force mirrors
    already parity-tested elsewhere."""
    import sys
    import types

    from tests.reference_loader import REF, _load

    ref_common = _load(
        REF / "lidargen/dataset/transforms_3d/common.py", "ref_common_pipe"
    )
    _load(REF / "lidargen/dataset/utils.py", "ref_ds_utils_pipe")
    _load(REF / "tools/vis_tools/utils/common.py", "ref_vis_common_pipe")

    # roiaware points_in_boxes_cpu → brute-force numpy mirror of
    # check_pt_in_box3d (roiaware_pool3d_kernel.cu:16-36)
    import torch as _torch

    def _pib_cpu(points_t, boxes_t):
        pts = points_t.numpy()
        boxes = boxes_t.numpy()
        out = np.zeros((len(boxes), len(pts)), np.int32)
        for i, b in enumerate(boxes):
            cx, cy, cz, dx, dy, dz, yaw = b[:7]
            local = pts[:, :3] - np.array([cx, cy, cz])
            c, s = np.cos(-yaw), np.sin(-yaw)
            lx = local[:, 0] * c - local[:, 1] * s
            ly = local[:, 0] * s + local[:, 1] * c
            out[i] = (
                (np.abs(lx) <= dx / 2)
                & (np.abs(ly) <= dy / 2)
                & (np.abs(local[:, 2]) <= dz / 2)
            )
        return _torch.from_numpy(out)

    roi_shim = types.ModuleType("ref_roiaware_shim")
    roi_shim.points_in_boxes_cpu = _pib_cpu
    sys.modules["ref_roiaware_shim"] = roi_shim

    # CustomDataset shim: reproduces exactly the projection + condition-mask
    # path the reference CustomDataset runs for refine_next_frame_points
    # (custom_dataset.py:57-84 + nuscenes_dataset.py:385-398), composed from
    # EXECUTED reference functions.
    CLASSES8 = (
        "car", "truck", "construction_vehicle", "bus", "trailer",
        "motorcycle", "bicycle", "pedestrian",
    )

    class _CustomDatasetShim:
        def __init__(self, custom_box_infos, cfg=None):
            self.data = custom_box_infos

        def __getitem__(self, idx):
            d = dict(self.data[idx])
            xyzrdm = ref_common.load_points_as_images(
                points=d["points"], scan_unfolding=False, H=32, W=1024,
                min_depth=1.45, max_depth=80.0, fov_up=10.0, fov_down=-30.0,
            ).transpose(2, 0, 1)
            xyzrdm *= xyzrdm[[5]]
            d.update(
                xyz=xyzrdm[:3], reflectance=xyzrdm[[3]] / 255,
                depth=xyzrdm[[4]], mask=xyzrdm[[5]],
            )
            class_names = ["ego"] + list(CLASSES8)
            gt_classes = np.array(
                [class_names.index(n) for n in d["gt_names"]], np.int32
            )
            gt_boxes = np.concatenate(
                [d["gt_boxes"], gt_classes.reshape(-1, 1).astype(np.float32)],
                axis=1,
            )
            _, condition_mask, _ = ref_common.convert_boxes_to_2d(
                boxes_3d=gt_boxes, H=32, W=1024, min_depth=1.45,
                max_depth=80.0, fov_up=10.0, fov_down=-30.0,
            )
            d["condition_mask"] = condition_mask
            return d

    shim = types.ModuleType("ref_custom_shim")
    shim.CustomDataset = _CustomDatasetShim
    shim.CustomNuscObjectDataset = _CustomDatasetShim
    sys.modules["ref_custom_shim"] = shim

    src = (REF / "tools/vis_tools/utils/pipe_related.py").read_text()
    src = src.replace(
        "from lidargen.dataset import utils", "import ref_ds_utils_pipe as utils"
    )
    src = src.replace(
        "from lidargen.ops.roiaware_pool3d import roiaware_pool3d_utils",
        "import ref_roiaware_shim as roiaware_pool3d_utils",
    )
    src = src.replace(
        "from lidargen.dataset.custom_dataset import CustomDataset, CustomNuscObjectDataset",
        "from ref_custom_shim import CustomDataset, CustomNuscObjectDataset",
    )
    src = src.replace(
        "from lidargen.metrics.models.ptv3.model import PTv3", "PTv3 = None"
    )
    src = src.replace("from . import common", "import ref_vis_common_pipe as common")
    mod = types.ModuleType("ref_pipe_related")
    exec(compile(src, "pipe_related.py", "exec"), mod.__dict__)
    return mod


def test_get_next_frame_points_composition_parity():
    """Full composed rollout step — warp bg by ego transform → hidden-surface
    + box-interior refine through the range image → fg replay at future boxes
    — vs the EXECUTED reference ``pipe_related.get_next_frame_points``
    (:243-270) on identical inputs."""
    from lidarcrafter_tpu.datasets import rollout as R

    ref_pipe = _load_ref_pipe_related()

    r = np.random.RandomState(7)
    N, K, P = 4000, 3, 64
    # background ring of points 5-60 m out
    ang = r.rand(N) * 2 * np.pi
    rad = 5 + r.rand(N) * 55
    bg = np.stack(
        [rad * np.cos(ang), rad * np.sin(ang),
         r.randn(N) * 1.5, r.rand(N) * 200],
        axis=1,
    ).astype(np.float32)

    fut_boxes = np.array(
        [[12.0, 2.0, 0.0, 4.5, 2.0, 1.8, 0.4],
         [-20.0, -8.0, 0.2, 8.0, 3.0, 3.2, -1.1],
         [6.0, -15.0, -0.3, 0.8, 0.8, 1.8, 0.0]],
        np.float32,
    )
    names = ["ego", "car", "truck", "pedestrian"]
    align_pts = [(r.randn(P, 3) * 0.5).astype(np.float32) for _ in range(K)]
    inten = [(r.rand(P) * 120).astype(np.float32) for _ in range(K)]

    th = 0.05
    c, s = np.cos(th), np.sin(th)
    Ts = np.array(
        [[c, -s, 0, 0.8], [s, c, 0, -0.3], [0, 0, 1, 0.02], [0, 0, 0, 1]],
        np.float32,
    )

    want = ref_pipe.get_next_frame_points(
        bg.copy(), align_pts, inten, fut_boxes.copy(), list(names), Ts
    )

    # ------- ours: transform → refine (condition mask) → replay → concat
    bg_next = R.transform_points_homogeneous(jnp.asarray(bg), jnp.asarray(Ts))
    classes = np.array([0, 1, 2, 8], np.float32)  # ['ego']+CLASSES8 indices
    boxes_cls = np.concatenate(
        [np.concatenate([np.zeros((1, 7), np.float32), fut_boxes]),
         classes[:, None]],
        axis=1,
    )
    ref_bg, ref_bg_mask = R.refine_points_via_condition_mask(
        bg_next, jnp.ones((N,), bool), jnp.asarray(boxes_cls),
        jnp.ones((K + 1,), bool), H=32, W=1024,
    )
    obj4 = jnp.asarray(
        np.stack([np.concatenate([p, i[:, None]], 1) for p, i in zip(align_pts, inten)])
    )
    fg, fg_mask = R.replay_objects(
        obj4, jnp.ones((K, P), bool), jnp.asarray(fut_boxes), jnp.ones((K,), bool)
    )
    got = np.concatenate(
        [np.asarray(ref_bg)[np.asarray(ref_bg_mask)],
         np.asarray(fg).reshape(-1, 4)],
        axis=0,
    )

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_temporal_rollout_batched_scenes():
    """S=2 scenes roll out in one pass; scene 0 with zero motion must match
    shape/finiteness and per-scene trajectories stay independent."""
    cond_engine, cond_params = _branch(10, extra_in=False, seed=0)
    auto_engine, auto_params = _branch(11, extra_in=True, seed=10)
    utils = LiDARUtility.create((H, W), "log_depth", 1.45, 80.0)

    pipeline = TemporalRollout(
        cond_engine=cond_engine, cond_params=cond_params,
        autoreg_engine=auto_engine, autoreg_params=auto_params,
        lidar_utils=utils, num_sampling_steps=2, sampling_mode="ddim",
        max_points_per_obj=64,
    )

    rng = np.random.RandomState(1)
    S, K = 2, 3
    boxes0 = np.zeros((S, K, 7), np.float32)
    boxes0[..., 0] = [10, -12, 20]
    boxes0[..., 1] = [4, -6, -2]
    boxes0[..., 3:6] = 3.0
    classes = np.tile(np.arange(1, K + 1, dtype=np.float32), (S, 1))
    trajs = rng.uniform(0.1, 0.6, (S, K + 1, 6, 2)).astype(np.float32)
    trajs[0] = 0.0  # scene 0: static

    first_batch = {
        "scaled_gt_boxes": jnp.asarray(rng.rand(S, L, 9).astype(np.float32)),
        "gt_boxes_2d": jnp.asarray(rng.rand(S, L, 4).astype(np.float32)),
        "is_valid_obj": jnp.ones((S, L)),
        "concat_cond": jnp.asarray(rng.rand(S, H, W, 10).astype(np.float32)),
    }

    frames = pipeline.rollout(
        first_batch, trajs, boxes0, classes,
        jax.random.PRNGKey(1), num_frames=2, interp_M=8,
    )
    assert len(frames) == 3
    for f in frames:
        assert f.shape == (S, H, W, 2)
        assert np.isfinite(f).all()
