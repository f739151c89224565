"""HDiT: forward shape/jit, neighborhood indices semantics, config build."""

import numpy as np

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.models.hdit import HDiT, _neighborhood_indices, rope_freqs


def test_neighborhood_indices_clamped_and_circular():
    hh, ww = _neighborhood_indices(8, 16, 3, 5, circular_w=True)
    assert hh.shape == (8, 16, 15)
    # H clamped at borders: row 0 window = rows 0..2
    assert set(hh[0, 0].tolist()) == {0, 1, 2}
    assert set(hh[7, 0].tolist()) == {5, 6, 7}
    # circular W: col 0 wraps to the end
    assert set(ww[0, 0].tolist()) == {14, 15, 0, 1, 2}
    assert set(ww[0, 15].tolist()) == {13, 14, 15, 0, 1}


def test_rope_freqs_shape_and_rounding():
    f = rope_freqs(head_dim=16, num_heads=4, max_harmonic=8)
    assert f.shape == (4, 4)
    assert np.all(f == np.round(f))
    assert f.min() >= 1 and f.max() <= 8


def test_hdit_forward_and_zero_init():
    m = HDiT(
        resolution=(16, 64), in_channels=2, base_channels=16,
        time_embed_channels=32, depths=(1, 1, 1, 1), num_heads=(2, 4, 8, 16),
        window_size=(3, 9),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64, 2))
    t = jnp.array([0.1, 0.9])
    p = m.init(jax.random.PRNGKey(1), x, t)
    out = jax.jit(lambda p, x, t: m.apply(p, x, t))(p, x, t)
    assert out.shape == (2, 16, 64, 2)
    # detokenizer zero-init → zero output at init (cf. Detokenizer zero_module)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_hdit_from_config_registry():
    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training import build_diffusion_training

    cfg = get_config("nuscenes-hdit-uncond")
    cfg.data.resolution = (16, 64)
    cfg.model.params.update(base_channels=16, time_embed_channels=32, depths=(1, 1, 1, 1))
    model, engine, _ = build_diffusion_training(cfg)
    x = jnp.zeros((1, 16, 64, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    loss = engine.loss(params, jax.random.PRNGKey(1), x)
    assert np.isfinite(float(loss))
