"""Model blocks: coordinate encodings + FIR resample parity, UNet forward shape/jit."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.models import encoding as enc
from lidarcrafter_tpu.models.efficient_unet import EfficientUNet
from lidarcrafter_tpu.models.ops import Resample, ring_pad, sinusoidal_embedding
from tests.reference_loader import load_ref_encoding, load_ref_unet_ops

ref_enc = load_ref_encoding()
ref_ops = load_ref_unet_ops()


def test_polar_coords_parity():
    ref = ref_enc.generate_polar_coords(32, 64)  # (1, 2, H, W)
    ours = enc.generate_polar_coords(32, 64)  # (H, W, 2)
    np.testing.assert_allclose(
        np.asarray(ours), ref[0].permute(1, 2, 0).numpy(), rtol=1e-5, atol=1e-5
    )


def test_spherical_harmonics_parity():
    coords_t = ref_enc.generate_polar_coords(16, 32)
    sh = ref_enc.SphericalHarmonics(levels=5)
    ref = sh(coords_t)  # (1, 25, H, W)
    ours = enc.spherical_harmonics_encoding(
        jnp.asarray(coords_t[0].permute(1, 2, 0).numpy()), levels=5
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref[0].permute(1, 2, 0).numpy(), rtol=1e-4, atol=1e-5
    )


def test_fourier_features_parity():
    H, W = 32, 1024
    coords_t = ref_enc.generate_polar_coords(H, W)
    ff = ref_enc.FourierFeatures((H, W))
    ref = ff(coords_t)  # (1, 30, H, W)
    ours = enc.fourier_features_encoding(
        jnp.asarray(coords_t[0].permute(1, 2, 0).numpy()), (H, W)
    )
    assert ours.shape == (H, W, ff.extra_ch)
    np.testing.assert_allclose(
        np.asarray(ours), ref[0].permute(1, 2, 0).numpy(), rtol=1e-3, atol=1e-3
    )


def test_sinusoidal_embedding_parity():
    spe = ref_ops.SinusoidalPositionalEmbedding(64)
    x = np.linspace(-15, 15, 7).astype(np.float32)
    ref = spe(torch.from_numpy(x)).numpy()
    ours = np.asarray(sinusoidal_embedding(jnp.asarray(x), 64))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_ring_pad_parity():
    pad = ref_ops.Pad(padding=2, ring=True)
    x = np.random.RandomState(0).randn(2, 3, 8, 16).astype(np.float32)
    ref = pad(torch.from_numpy(x)).numpy()
    ours = np.asarray(ring_pad(jnp.asarray(x.transpose(0, 2, 3, 1)), 2, ring=True))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-6)


@pytest.mark.parametrize("up,down", [(1, 2), (2, 1)])
def test_fir_resample_parity(up, down):
    torch_resample = ref_ops.Resample(up=up, down=down, ring=True)
    x = np.random.RandomState(1).randn(2, 4, 8, 32).astype(np.float32)
    ref = torch_resample(torch.from_numpy(x)).numpy()

    model = Resample(up=up, down=down, ring=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    ours = np.asarray(model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("coords_encoding", [None, "fourier_features"])
def test_efficient_unet_forward(coords_encoding):
    model = EfficientUNet(
        in_channels=2,
        resolution=(32, 128),
        base_channels=16,
        channel_multiplier=(1, 2, 4, 8),
        num_residual_blocks=(1, 1, 1, 1),
        gn_num_groups=4,
        coords_encoding=coords_encoding,
        ring=True,
        use_ray_angle_coords=True,
    )
    x = jnp.zeros((2, 32, 128, 2))
    t = jnp.array([0.1, 0.9])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = jax.jit(model.apply)(params, x, t)
    assert out.shape == (2, 32, 128, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_efficient_unet_zero_init_output():
    """out_conv is zero-initialised (ops.zero_out), so fresh output == 0."""
    model = EfficientUNet(
        in_channels=2, resolution=(32, 64), base_channels=8,
        num_residual_blocks=(1, 1, 1, 1), gn_num_groups=4,
        coords_encoding=None, ring=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 64, 2))
    t = jnp.array([0.5])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_efficient_unet_azimuth_equivariance():
    """Ring conv + circular padding ⇒ rolling the azimuth axis commutes with the net."""
    model = EfficientUNet(
        in_channels=1, resolution=(32, 64), base_channels=8,
        num_residual_blocks=(1, 1, 1, 1), gn_num_groups=4,
        coords_encoding=None, ring=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 64, 1))
    t = jnp.array([0.3])
    params = model.init(jax.random.PRNGKey(0), x, t)
    shift = 16
    out1 = model.apply(params, jnp.roll(x, shift, axis=2), t)
    out2 = jnp.roll(model.apply(params, x, t), shift, axis=2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-4)


def test_refinenet_forward():
    from lidarcrafter_tpu.models.refinenet import LiDARGenRefineNet

    m = LiDARGenRefineNet(in_channels=2, resolution=(16, 32), base_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 2))
    p = m.init(jax.random.PRNGKey(1), x)
    out = jax.jit(lambda p, x: m.apply(p, x))(p, x)
    assert out.shape == (1, 16, 32, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_refinenet_converter_reference_parity():
    """Executed-reference numerical parity of convert_refinenet (LiDARGen
    legacy NCSN backbone, ``lidargen/models/refinenet.py:157-233``)."""
    import torch

    from tests.reference_loader import REF, _load
    from lidarcrafter_tpu.models.refinenet import LiDARGenRefineNet
    from lidarcrafter_tpu.utils.torch_ckpt import convert_refinenet

    ref_mod = _load(REF / "lidargen/models/refinenet.py", "ref_refinenet")
    torch.manual_seed(0)
    ref = ref_mod.LiDARGenRefineNet(
        in_channels=2, resolution=(16, 32), base_channels=8,
        channel_multiplier=(1, 2, 2, 2),
    ).eval()

    B = 2
    x = torch.randn(B, 2, 16, 32)
    with torch.no_grad():
        ref_out = ref(x, torch.zeros(B)).permute(0, 2, 3, 1).numpy()

    model = LiDARGenRefineNet(
        in_channels=2, resolution=(16, 32), base_channels=8,
        channel_multiplier=(1, 2, 2, 2),
    )
    variables = convert_refinenet(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    out = model.apply(variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-5)


def test_groupnorm32_onepass_matches_direct(monkeypatch):
    """The TPU bf16 inference path switches GroupNorm32 to one-pass f32
    sum/sumsq stats (2 HBM reads instead of 3); it must agree with the
    direct-variance form to bf16 resolution, and fp32 inputs must keep the
    direct form exactly."""
    from lidarcrafter_tpu.models.ops import GroupNorm32

    gn = GroupNorm32(num_groups=32, epsilon=1e-5)
    x32 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 64, 64)) * 3.0 + 1.5
    params = gn.init(jax.random.PRNGKey(1), x32)
    ref = gn.apply(params, x32)  # CPU fp32: direct two-pass form

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    bf16_params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params
    )
    got_bf16 = gn.apply(bf16_params, x32.astype(jnp.bfloat16))
    assert got_bf16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got_bf16, np.float32), np.asarray(ref), atol=5e-2, rtol=5e-2
    )
    # fp32 input on "tpu": still the direct form, bitwise equal to CPU path
    got_f32 = gn.apply(params, x32)
    np.testing.assert_array_equal(np.asarray(got_f32), np.asarray(ref))
    # env kill-switch forces the direct form even for bf16
    monkeypatch.setenv("LCT_ONEPASS_GN", "0")
    got_off = gn.apply(params, x32.astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(got_off, np.float32), np.asarray(ref), atol=5e-2, rtol=5e-2
    )
