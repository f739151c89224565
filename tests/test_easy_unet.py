"""Parity for the trivial cond encoders (easy_unet registry keys).

SpatialRescaler's bilinear resize is checked against torch
``F.interpolate(..., mode='bilinear', align_corners=True)`` — the exact call
the reference makes (``lidargen/models/unets/easy_unet.py:24,33``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.models import __all_models__, build_model
from lidarcrafter_tpu.models.easy_unet import bilinear_resize_align_corners

torch = pytest.importorskip("torch")


def test_registry_keys_present():
    assert "easy_unet" in __all_models__
    assert "identity" in __all_models__


def test_identity_passthrough():
    model = build_model("identity", out_channels=7)
    x = jnp.ones((2, 4, 8, 3))
    params = model.init(jax.random.PRNGKey(0), {"cond": x})
    out = model.apply(params, {"cond": x})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


@pytest.mark.parametrize("in_hw,strides", [((32, 1024), [(2, 2)]), ((32, 64), [(2, 4), (2, 2)])])
def test_spatial_rescaler_matches_torch_bilinear(in_hw, strides):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)

    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    for h_s, w_s in strides:
        t = torch.nn.functional.interpolate(
            t, scale_factor=(1 / h_s, 1 / w_s), mode="bilinear", align_corners=True
        )
    expect = t.permute(0, 2, 3, 1).numpy()

    model = build_model("easy_unet", strides=strides, in_channels=3)
    params = model.init(jax.random.PRNGKey(0), {"cond": jnp.asarray(x)})
    got = np.asarray(model.apply(params, {"cond": jnp.asarray(x)}))
    np.testing.assert_allclose(got, expect, atol=5e-4)


def test_spatial_rescaler_channel_map_shape():
    model = build_model("easy_unet", strides=[(2, 2)], in_channels=3, out_channels=16)
    x = jnp.ones((1, 8, 16, 3))
    params = model.init(jax.random.PRNGKey(0), {"cond": x})
    out = model.apply(params, {"cond": x})
    assert out.shape == (1, 4, 8, 16)
