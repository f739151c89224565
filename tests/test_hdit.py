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


# ------------------------------------------------- executed-reference parity


def _load_ref_hdit():
    """Execute the reference hdit.py (never copied) with a natten stub whose
    na2d_qk/na2d_av brute-force the clamped neighborhood windows."""
    import sys
    import types

    import torch

    from tests.reference_loader import REF, _load

    natten = types.ModuleType("natten")
    context = types.ModuleType("natten.context")
    context.is_fna_enabled = lambda: False
    functional = types.ModuleType("natten.functional")

    def _windows(H, W, kh, kw):
        wins = []
        for i in range(H):
            si = min(max(i - kh // 2, 0), max(H - kh, 0))
            row = []
            for j in range(W):
                sj = min(max(j - kw // 2, 0), max(W - kw, 0))
                row.append((si, sj))
            wins.append(row)
        return wins

    def na2d_qk(q, k, kernel_size, *a, **kw_):
        B, N, H, W, D = q.shape
        kh, kw = kernel_size
        out = torch.empty(B, N, H, W, kh * kw, dtype=q.dtype)
        for i, row in enumerate(_windows(H, W, kh, kw)):
            for j, (si, sj) in enumerate(row):
                win = k[:, :, si:si + kh, sj:sj + kw].reshape(B, N, kh * kw, D)
                out[:, :, i, j] = torch.einsum("bnd,bnkd->bnk", q[:, :, i, j], win)
        return out

    def na2d_av(a, v, kernel_size, *ar, **kw_):
        B, N, H, W, K = a.shape
        kh, kw = kernel_size
        D = v.shape[-1]
        out = torch.empty(B, N, H, W, D, dtype=v.dtype)
        for i, row in enumerate(_windows(H, W, kh, kw)):
            for j, (si, sj) in enumerate(row):
                win = v[:, :, si:si + kh, sj:sj + kw].reshape(B, N, K, D)
                out[:, :, i, j] = torch.einsum("bnk,bnkd->bnd", a[:, :, i, j], win)
        return out

    functional.na2d_qk = na2d_qk
    functional.na2d_av = na2d_av
    natten.context = context
    natten.functional = functional
    sys.modules["natten"] = natten
    sys.modules["natten.context"] = context
    sys.modules["natten.functional"] = functional

    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [str(REF / "lidargen/models")]
    sys.modules["refmodels"] = pkg
    unets = types.ModuleType("refmodels.unets")
    unets.__path__ = [str(REF / "lidargen/models/unets")]
    sys.modules["refmodels.unets"] = unets
    enc = _load(REF / "lidargen/models/unets/encoding.py", "refmodels.unets.encoding")
    ops = _load(REF / "lidargen/models/unets/ops.py", "refmodels.unets.ops")
    unets.encoding, unets.ops = enc, ops
    dits = types.ModuleType("refmodels.dits")
    dits.__path__ = [str(REF / "lidargen/models/dits")]
    sys.modules["refmodels.dits"] = dits
    return _load(REF / "lidargen/models/dits/hdit.py", "refmodels.dits.hdit")


def test_hdit_converter_reference_parity():
    """Executed-reference numerical parity of the HDiT converter on a narrow
    config (same recipe as the other converter families)."""
    import torch

    from lidarcrafter_tpu.utils.torch_ckpt import convert_hdit

    ref_mod = _load_ref_hdit()
    torch.manual_seed(0)
    kwargs = dict(
        resolution=(8, 32), in_channels=2, base_channels=16,
        time_embed_channels=16, patch_size=(1, 4), window_size=(3, 3),
        depths=(1, 1), num_heads=(2, 4), mlp_ratio=2.0, mapping_depth=1,
        positional_embedding="learnable_embedding",
    )
    ref = ref_mod.HDiT(**kwargs).eval()
    # break the zero-init symmetry so parity exercises every layer
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if p.abs().max() == 0:
                p.normal_(0, 0.05)

    B = 2
    x = torch.randn(B, 2, 8, 32)
    t = torch.rand(B)
    with torch.no_grad():
        ref_out = ref(x, t).permute(0, 2, 3, 1).numpy()

    model = HDiT(**{**kwargs, "dropout": 0.0})
    variables = convert_hdit({k: v.numpy() for k, v in ref.state_dict().items()})
    out = model.apply(
        variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(t.numpy()),
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-5)
