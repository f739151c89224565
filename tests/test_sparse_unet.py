"""Sparse UNet backbones (MinkowskiNet / SPVCNN) + point-voxel interop."""

import numpy as np

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.metrics.extractor.sparse_unet import (
    SPVCNN,
    MinkowskiNet,
    aggregate_sectors,
)
from lidarcrafter_tpu.ops.sparse import (
    point_to_voxel_mean,
    voxel_to_point_trilinear,
    voxelize_mean,
)

TINY = dict(layer_num=(8, 8, 8, 8, 8, 8, 8, 8, 8), cr=1.0, input_dims=4,
            num_classes=5, voxel_size=0.5, max_voxels=128)


def _cloud(n_valid=40, n_pad=64, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((n_pad, 3), np.float32)
    pts[:n_valid] = rng.uniform(0, 12, (n_valid, 3))
    feats = np.zeros((n_pad, 4), np.float32)
    feats[:n_valid] = rng.randn(n_valid, 4)
    mask = np.arange(n_pad) < n_valid
    return jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mask)


def test_trilinear_devoxelize_known_weights():
    # one voxel at (0,0,0) with feature [2.0]
    vc = jnp.zeros((4, 3), jnp.int32)
    vf = jnp.array([[2.0], [0.0], [0.0], [0.0]])
    vm = jnp.array([True, False, False, False])
    # point exactly at the voxel coord → weight 1; at frac .5 in x → 0.5
    pts = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    pm = jnp.ones((2,), bool)
    out = np.asarray(voxel_to_point_trilinear(vf, vc, vm, pts, pm, level=0))
    np.testing.assert_allclose(out[:, 0], [2.0, 1.0], atol=1e-6)


def test_point_to_voxel_mean_averages():
    vc = jnp.array([[0, 0, 0], [1, 0, 0]], jnp.int32)
    vc = jnp.pad(vc, ((0, 2), (0, 0)))
    vm = jnp.array([True, True, False, False])
    pts = jnp.array([[0.2, 0.2, 0.2], [0.8, 0.8, 0.8], [1.5, 0.1, 0.1]])
    pm = jnp.ones((3,), bool)
    pf = jnp.array([[1.0], [3.0], [7.0]])
    out = np.asarray(point_to_voxel_mean(pf, pts, pm, vc, vm, level=0))
    np.testing.assert_allclose(out[0, 0], 2.0)  # mean(1, 3)
    np.testing.assert_allclose(out[1, 0], 7.0)
    np.testing.assert_allclose(out[2:], 0.0)


def test_voxelize_mean_pools():
    pts = jnp.array([[0.1, 0.1, 0.1], [0.4, 0.4, 0.4], [3.0, 3.0, 3.0]])
    feats = jnp.array([[2.0], [4.0], [9.0]])
    vf, vc, vm, pvox, inv = voxelize_mean(pts, feats, 1.0, max_voxels=8)
    assert int(vm.sum()) == 2
    vals = sorted(np.asarray(vf)[np.asarray(vm), 0].tolist())
    assert vals == [3.0, 9.0]


def test_minkowskinet_forward_masked():
    pts, feats, mask = _cloud()
    model = MinkowskiNet(**TINY)
    params = model.init(jax.random.PRNGKey(0), pts, feats, mask)
    out = model.apply(params, pts, feats, mask)
    assert out["logits"].shape == (128, 8)
    assert out["output"].shape == (128, 5)
    assert out["bottleneck"].shape == (128, 8)
    assert np.isfinite(np.asarray(out["logits"])).all()
    # invalid voxel slots stay zero
    assert np.abs(np.asarray(out["logits"])[~np.asarray(out["mask"])]).max() == 0


def test_spvcnn_forward_per_point():
    pts, feats, mask = _cloud()
    model = SPVCNN(**TINY)
    params = model.init(jax.random.PRNGKey(1), pts, feats, mask)
    out = model.apply(params, pts, feats, mask)
    assert out["logits"].shape == (64, 8)  # per-point
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert np.abs(np.asarray(out["logits"])[~np.asarray(mask)]).max() == 0


def test_spvcnn_padding_invariance():
    """Extra padding slots must not change valid-point features."""
    pts, feats, mask = _cloud(n_valid=30, n_pad=48, seed=3)
    model = SPVCNN(**TINY)
    params = model.init(jax.random.PRNGKey(2), pts, feats, mask)
    out1 = model.apply(params, pts, feats, mask)["logits"][:30]
    pts2 = jnp.pad(pts, ((0, 16), (0, 0)))
    feats2 = jnp.pad(feats, ((0, 16), (0, 0)))
    mask2 = jnp.pad(mask, (0, 16))
    out2 = model.apply(params, pts2, feats2, mask2)["logits"][:30]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_engine_fsvd_fpvd_smoke():
    """FSVD/FPVD through the EvaluationEngine: 0 on identical sets, >0 else."""
    from lidarcrafter_tpu.metrics.engine import EvaluationEngine
    from lidarcrafter_tpu.metrics.extractor.sparse_unet import (
        make_sparse_descriptor_fn,
    )

    rng = np.random.RandomState(7)
    clouds_a = [rng.uniform(-20, 20, (300, 3)).astype(np.float32) for _ in range(4)]
    clouds_b = [rng.uniform(-10, 10, (300, 3)).astype(np.float32) for _ in range(4)]

    cfg = dict(TINY, max_voxels=512)
    mink = MinkowskiNet(**cfg)
    spv = SPVCNN(**cfg)
    dummy = (jnp.zeros((1024, 3)), jnp.zeros((1024, 4)), jnp.ones((1024,), bool))
    mp = mink.init(jax.random.PRNGKey(0), *dummy)
    sp = spv.init(jax.random.PRNGKey(1), *dummy)
    engine = EvaluationEngine(
        voxel_apply=make_sparse_descriptor_fn(mink, mp),
        point_voxel_apply=make_sparse_descriptor_fn(spv, sp),
        max_points_sparse=1024,
    )
    res = engine.evaluate(clouds_a, clouds_b, metrics=("fsvd", "fpvd"))
    assert np.isfinite(res["fsvd"]) and res["fsvd"] > 0
    assert np.isfinite(res["fpvd"]) and res["fpvd"] > 0
    same = engine.evaluate(clouds_a, clouds_a, metrics=("fsvd",))
    assert abs(same["fsvd"]) < 1e-3


def _fake_torchsparse_sd(cs, input_dims, num_classes, spvcnn=False, seed=0):
    """Hand-built state_dict with torchsparse v1.4 names/shapes."""
    rng = np.random.RandomState(seed)
    sd = {}

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def add_res(prefix, ci, co):
        sd[f"{prefix}.net.0.weight"] = rng.randn(27, ci, co).astype(np.float32)
        add_bn(f"{prefix}.net.1", co)
        sd[f"{prefix}.net.3.weight"] = rng.randn(27, co, co).astype(np.float32)
        add_bn(f"{prefix}.net.4", co)
        if ci != co:
            sd[f"{prefix}.downsample.0.weight"] = rng.randn(ci, co).astype(np.float32)
            add_bn(f"{prefix}.downsample.1", co)

    sd["stem.0.weight"] = rng.randn(27, input_dims, cs[0]).astype(np.float32)
    add_bn("stem.1", cs[0])
    sd["stem.3.weight"] = rng.randn(27, cs[0], cs[0]).astype(np.float32)
    add_bn("stem.4", cs[0])
    for k in range(1, 5):
        sd[f"stage{k}.0.net.0.weight"] = rng.randn(8, cs[k - 1], cs[k - 1]).astype(np.float32)
        add_bn(f"stage{k}.0.net.1", cs[k - 1])
        add_res(f"stage{k}.1", cs[k - 1], cs[k])
        add_res(f"stage{k}.2", cs[k], cs[k])
    for j in range(1, 5):
        sd[f"up{j}.0.net.0.weight"] = rng.randn(8, cs[3 + j], cs[4 + j]).astype(np.float32)
        add_bn(f"up{j}.0.net.1", cs[4 + j])
        add_res(f"up{j}.1.0", cs[4 + j] + cs[4 - j], cs[4 + j])
        add_res(f"up{j}.1.1", cs[4 + j], cs[4 + j])
    sd["classifier.0.weight"] = rng.randn(num_classes, cs[8]).astype(np.float32)
    sd["classifier.0.bias"] = rng.randn(num_classes).astype(np.float32)
    if spvcnn:
        for i, (ci, co) in enumerate([(cs[0], cs[4]), (cs[4], cs[6]), (cs[6], cs[8])]):
            sd[f"point_transforms.{i}.0.weight"] = rng.randn(co, ci).astype(np.float32)
            sd[f"point_transforms.{i}.0.bias"] = rng.randn(co).astype(np.float32)
            add_bn(f"point_transforms.{i}.1", co)
    return sd


def test_convert_torchsparse_state_dict_tree_match():
    """Converted params must match model.init tree exactly and run."""
    import chex
    from lidarcrafter_tpu.metrics.extractor.sparse_unet import (
        convert_torchsparse_state_dict,
    )

    layers = (4, 4, 8, 8, 16, 16, 8, 4, 4)
    cfg = dict(layer_num=layers, cr=1.0, input_dims=4, num_classes=5,
               voxel_size=0.5, max_voxels=128)
    pts, feats, mask = _cloud()
    for cls, is_spv in ((MinkowskiNet, False), (SPVCNN, True)):
        model = cls(**cfg)
        ref_tree = model.init(jax.random.PRNGKey(0), pts, feats, mask)
        sd = _fake_torchsparse_sd(list(layers), 4, 5, spvcnn=is_spv)
        got = convert_torchsparse_state_dict(sd)
        chex.assert_trees_all_equal_shapes(ref_tree, got)
        out = model.apply(got, pts, feats, mask)
        assert np.isfinite(np.asarray(out["logits"])).all()


def test_aggregate_sectors_matches_numpy():
    rng = np.random.RandomState(4)
    N, C = 60, 6
    logits = rng.randn(N, C).astype(np.float32)
    coords = rng.uniform(0, 600, (N, 3)).astype(np.float32)
    mask = np.arange(N) < 50
    got = np.asarray(
        aggregate_sectors(jnp.asarray(logits), jnp.asarray(coords),
                          jnp.asarray(mask), agg_type="depth",
                          depth_range=(1.0, 45.0), voxel_size=0.05)
    )
    # numpy reference (mirrors metric_utils.batch2list 'depth')
    lg, cd = logits[mask], coords[mask]
    cd = cd - cd.mean(0)
    depth = np.linalg.norm(cd, axis=-1) * 0.05
    edges = np.linspace(4.0, 45.0, 17)
    edges[0] = 0.0
    want = []
    for i in range(16):
        sel = (depth >= edges[i]) & (depth < edges[i + 1])
        want.append(np.nan_to_num(lg[sel].mean(0)) if sel.any() else np.zeros(C))
    want = np.concatenate(want)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert got.shape == (96,)
