"""Torch checkpoint ingestion: full-model numerical parity.

Builds the reference torch EfficientUNet (random init), converts its
state_dict to flax params, and compares forward outputs — the strongest
possible architecture+ingestion parity check.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.models.efficient_unet import EfficientUNet
from lidarcrafter_tpu.utils.torch_ckpt import convert_efficient_unet

REF = Path("/root/reference")


def _load_ref_efficient_unet():
    pkg = types.ModuleType("refunets")
    pkg.__path__ = [str(REF / "lidargen/models/unets")]
    sys.modules["refunets"] = pkg
    for name in ("encoding", "ops", "efficient_unet"):
        spec = importlib.util.spec_from_file_location(
            f"refunets.{name}", REF / f"lidargen/models/unets/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refunets.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return sys.modules["refunets.efficient_unet"]


ref_eu = _load_ref_efficient_unet()

H, W = 32, 64
KW = dict(
    in_channels=2,
    resolution=(H, W),
    base_channels=16,
    channel_multiplier=(1, 2, 4, 8),
    num_residual_blocks=(1, 1, 1, 1),
    gn_num_groups=4,
    attn_num_heads=4,
    coords_encoding="fourier_features",
    ring=True,
)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tmodel = ref_eu.EfficientUNet(**KW).eval()
    # make zero-inited parts nontrivial so parity is meaningful
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
    jmodel = EfficientUNet(**KW)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_efficient_unet(sd, attn_num_heads=KW["attn_num_heads"])
    return tmodel, jmodel, params


def test_full_forward_parity(pair):
    tmodel, jmodel, params = pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 2, H, W).astype(np.float32)
    t = np.array([-3.0, 4.0], np.float32)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    got = jmodel.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_param_tree_is_complete(pair):
    _, jmodel, params = pair
    ref_init = jmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 2)), jnp.zeros((1,))
    )
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_init)
    got_leaves = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    )
    assert len(ref_leaves) == len(got_leaves)
    for path, leaf in ref_leaves:
        key = jax.tree_util.keystr(path)
        assert key in got_leaves, f"missing {key}"
        assert got_leaves[key].shape == leaf.shape, key
