"""Extractor parity: torch reference PointNet vs converted flax model."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.metrics.extractor import (
    PointNetFeatureExtractor,
    convert_pointnet_state_dict,
)
from tests.reference_loader import REF, _load

ref_pn = _load(REF / "lidargen/metrics/extractor/pointnet.py", "ref_pointnet")


def test_pointnet_forward_parity():
    torch.manual_seed(0)
    tmodel = ref_pn.PointNet1(k=16).eval()
    # randomize BN running stats so the parity test is nontrivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    params = convert_pointnet_state_dict(tmodel.state_dict())
    jmodel = PointNetFeatureExtractor(k=16)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 128).astype(np.float32)  # torch layout (B, 3, N)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    assert got.shape == want.shape == (2, 1024 + 512 + 256 + 16)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_pointmlp_forward_and_train_mode():
    from lidarcrafter_tpu.metrics.extractor.pointmlp import point_mlp

    m = point_mlp(num_classes=8, points=128, embed_dim=16,
                  pre_blocks=(1, 1), pos_blocks=(1, 1), dim_expansion=(2, 2),
                  k_neighbors=(8, 8), reducers=(2, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 3))
    variables = m.init(jax.random.PRNGKey(1), x)
    logits = m.apply(variables, x)
    assert logits.shape == (2, 8)
    feats = m.apply(variables, x, return_features=True)
    assert feats.shape == (2, 16 * 4)
    # train step updates batch stats
    out, mutated = m.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out.shape == (2, 8)
    assert "batch_stats" in mutated


def test_rangenet_parity_small():
    """torch reference RangeNet21 (random init) vs converted flax model."""
    import importlib.util, sys, types

    # stub torchvision (absent in this env; only used by Preprocess)
    tv = types.ModuleType("torchvision")
    tv.transforms = types.SimpleNamespace(Normalize=lambda **k: (lambda x: x))
    sys.modules.setdefault("torchvision", tv)
    spec = importlib.util.spec_from_file_location(
        "ref_rangenet", REF / "lidargen/metrics/extractor/rangenet.py"
    )
    ref_rn = importlib.util.module_from_spec(spec)
    sys.modules["ref_rangenet"] = ref_rn
    spec.loader.exec_module(ref_rn)

    from lidarcrafter_tpu.metrics.extractor.rangenet import (
        RangeNet,
        convert_rangenet_state_dict,
        preprocess_range_input,
    )

    torch.manual_seed(0)
    tmodel = ref_rn.RangeNet(
        inputs={"range": True, "xyz": True, "remission": True, "mask": False},
        num_classes=7, backbone=21,
    ).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 2.0)

    params = convert_rangenet_state_dict(tmodel.state_dict())
    jmodel = RangeNet(num_classes=7, in_ch=5, backbone=21)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 5, 32, 64).astype(np.float32)
    with torch.no_grad():
        want_logits = tmodel(torch.from_numpy(x)).numpy()
        want_feats = tmodel(torch.from_numpy(x), feature="lidargen").numpy()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    got_logits = np.asarray(jmodel.apply(params, xj))
    np.testing.assert_allclose(
        got_logits.transpose(0, 3, 1, 2), want_logits, rtol=1e-3, atol=1e-3
    )
    got_feats = np.asarray(jmodel.apply(params, xj, feature="lidargen"))
    np.testing.assert_allclose(got_feats, want_feats, rtol=1e-3, atol=1e-3)

    pre = preprocess_range_input(xj)
    assert pre.shape == xj.shape


def test_convert_rangenet_folder_tree_and_descriptor():
    """Pretrained-folder (darknet-named backbone/decoder state_dicts) →
    flax tree match + FRID descriptor aggregation semantics."""
    import chex

    from lidarcrafter_tpu.metrics.extractor.rangenet import (
        RangeNet,
        convert_rangenet_folder,
        rangenet_frid_descriptor,
    )

    r = np.random.RandomState(0)
    b, d = {}, {}

    def bn(sd, p, c):
        sd[f"{p}.weight"] = r.rand(c).astype(np.float32) + 0.5
        sd[f"{p}.bias"] = r.randn(c).astype(np.float32) * 0.1
        sd[f"{p}.running_mean"] = r.randn(c).astype(np.float32) * 0.1
        sd[f"{p}.running_var"] = r.rand(c).astype(np.float32) + 0.5

    chans = [32, 64, 128, 256, 512, 1024]
    b["conv1.weight"] = r.randn(32, 5, 3, 3).astype(np.float32) * 0.05
    bn(b, "bn1", 32)
    nrb = [1, 1, 2, 2, 1]  # darknet-21
    for k in range(1, 6):
        ci, co = chans[k - 1], chans[k]
        b[f"enc{k}.conv.weight"] = r.randn(co, ci, 3, 3).astype(np.float32) * 0.05
        bn(b, f"enc{k}.bn", co)
        for j in range(nrb[k - 1]):
            p = f"enc{k}.residual_{j}"
            b[f"{p}.conv1.weight"] = r.randn(ci, co, 1, 1).astype(np.float32) * 0.05
            bn(b, f"{p}.bn1", ci)
            b[f"{p}.conv2.weight"] = r.randn(co, ci, 3, 3).astype(np.float32) * 0.05
            bn(b, f"{p}.bn2", co)
    dec_planes = [(1024, 512), (512, 256), (256, 128), (128, 64), (64, 32)]
    for idx, (d0, d1) in enumerate(dec_planes):
        j = 5 - idx
        d[f"dec{j}.upconv.weight"] = r.randn(d0, d1, 1, 4).astype(np.float32) * 0.05
        d[f"dec{j}.upconv.bias"] = r.randn(d1).astype(np.float32) * 0.05
        bn(d, f"dec{j}.bn", d1)
        p = f"dec{j}.residual"
        d[f"{p}.conv1.weight"] = r.randn(d0, d1, 1, 1).astype(np.float32) * 0.05
        bn(d, f"{p}.bn1", d0)
        d[f"{p}.conv2.weight"] = r.randn(d1, d0, 3, 3).astype(np.float32) * 0.05
        bn(d, f"{p}.bn2", d1)

    params = convert_rangenet_folder(b, d)
    model = RangeNet(num_classes=17, backbone=21)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 5)))
    chex.assert_trees_all_equal_shapes(ref, params)
    out = model.apply(params, jnp.asarray(np.random.rand(1, 32, 64, 5), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()

    # descriptor aggregation matches a channel-major torch-view replay
    logits = r.randn(2, 32, 64, 6).astype(np.float32)
    got = np.asarray(rangenet_frid_descriptor(jnp.asarray(logits), "depth"))
    lt = logits.transpose(0, 3, 1, 2)  # (B, C, H, W)
    want = lt.reshape(2, 6, 16, 2, 64).mean(axis=(3, 4)).reshape(2, -1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got.shape == (2, 96)
