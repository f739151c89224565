"""GLENet CVAE uncertainty model: train/eval forward + MC uncertainty."""

import numpy as np

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.metrics.models.glenet import (
    GLENet,
    add_sin_difference,
    get_direction_target,
    kl_diag_gaussians,
    mc_uncertainty,
)


def _batch(B=4, N=64, seed=0):
    r = np.random.RandomState(seed)
    return {
        "points": jnp.asarray(r.randn(B, N, 3).astype(np.float32)),
        "text_feat": jnp.asarray(r.randn(B, 512).astype(np.float32)),
        "gt_boxes_input": jnp.asarray(r.randn(B, 8).astype(np.float32)),
        "gt_boxes": jnp.asarray(r.randn(B, 7).astype(np.float32)),
    }


def test_kl_zero_for_identical():
    mu = jnp.asarray([[0.5, -0.2]])
    lv = jnp.asarray([[0.1, -0.3]])
    np.testing.assert_allclose(float(kl_diag_gaussians(mu, lv, mu, lv)[0]), 0.0, atol=1e-6)
    # KL > 0 for different distributions
    assert float(kl_diag_gaussians(mu, lv, mu + 1, lv)[0]) > 0


def test_sin_difference_and_direction_target():
    b1 = jnp.asarray([[0, 0, 0, 1, 1, 1, 0.3]])
    b2 = jnp.asarray([[0, 0, 0, 1, 1, 1, 0.1]])
    s1, s2 = add_sin_difference(b1, b2)
    # sin(a)cos(b) - cos(a)sin(b) = sin(a-b)
    np.testing.assert_allclose(
        float(s1[0, 6] - s2[0, 6]), np.sin(0.2), rtol=1e-5
    )
    tg = get_direction_target(jnp.asarray([[0, 0, 0, 1, 1, 1, 0.5]]))
    np.testing.assert_array_equal(np.asarray(tg)[0], [1, 0])
    tg = get_direction_target(jnp.asarray([[0, 0, 0, 1, 1, 1, np.pi + 0.5]]))
    np.testing.assert_array_equal(np.asarray(tg)[0], [0, 1])


def test_glenet_train_and_eval():
    model = GLENet()
    batch = _batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, rng=jax.random.PRNGKey(1), train=True
    )
    (reg_loss, latent_loss, box_pred), mutated = model.apply(
        variables, batch, rng=jax.random.PRNGKey(2), train=True,
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(reg_loss)) and np.isfinite(float(latent_loss))
    assert box_pred.shape == (4, 9)

    pred = model.apply(variables, batch, rng=jax.random.PRNGKey(3))
    assert pred.shape == (4, 9)
    # heading decoded into a real angle
    assert np.isfinite(np.asarray(pred)).all()


def test_mc_uncertainty_variance_positive():
    model = GLENet()
    batch = _batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, rng=jax.random.PRNGKey(1), train=True
    )
    apply_fn = lambda bd, rng: model.apply(variables, bd, rng=rng)
    var, mean = mc_uncertainty(apply_fn, batch, jax.random.PRNGKey(5), num_passes=5)
    assert var.shape == (4, 7)
    assert (np.asarray(var) >= 0).all()
    assert np.asarray(var).sum() > 0  # stochastic latents → nonzero variance


# ------------------------------------------------------- torch ckpt ingestion


def _load_ref_glenet():
    """Execute the reference GLENet modules (never copied), stubbing the
    pcdet/torchvision imports the point branch never touches."""
    import importlib.util
    import sys
    import types

    from tests.reference_loader import REF

    torch = __import__("torch")

    for name in ("torchvision", "torchvision.models"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    if "pcdet" not in sys.modules:
        pcdet = types.ModuleType("pcdet")
        utils = types.ModuleType("pcdet.utils")
        loss_utils = types.ModuleType("pcdet.utils.loss_utils")
        common_utils = types.ModuleType("pcdet.utils.common_utils")
        utils.loss_utils, utils.common_utils = loss_utils, common_utils
        pcdet.utils = utils
        for n, m in (("pcdet", pcdet), ("pcdet.utils", utils),
                     ("pcdet.utils.loss_utils", loss_utils),
                     ("pcdet.utils.common_utils", common_utils)):
            sys.modules[n] = m

    pkg = types.ModuleType("refglenet")
    pkg.__path__ = [str(REF / "lidargen/metrics/models/glenet")]
    sys.modules["refglenet"] = pkg
    for name in ("point_net", "model"):
        spec = importlib.util.spec_from_file_location(
            f"refglenet.{name}", REF / f"lidargen/metrics/models/glenet/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refglenet.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return sys.modules["refglenet.model"]


def test_glenet_torch_ckpt_ingestion_parity():
    """Executed-reference encoders (Encoder_x / Encoder_xy /
    Object_feat_encoder, ``model.py:33-149``) vs converted weights — the RGF
    metric can run the reference's released GLENet checkpoints."""
    import torch

    from lidarcrafter_tpu.utils.torch_ckpt import convert_glenet

    ref = _load_ref_glenet()
    torch.manual_seed(0)
    tx = ref.Encoder_x(4, 1, 3)
    txy = ref.Encoder_xy(4, 1, 3)
    tobj = ref.Object_feat_encoder(4, 1, latent_dim=3)

    r = np.random.RandomState(0)
    pts = r.randn(6, 4, 128).astype(np.float32)  # torch layout (B, C, N)
    text = r.randn(6, 512).astype(np.float32)
    y = r.randn(6, 8).astype(np.float32)
    z = r.randn(6, 3).astype(np.float32)

    # drive BN running stats away from init, then freeze
    x_dict = {"x": torch.from_numpy(pts), "text_feat": torch.from_numpy(text)}
    for m in (tx, txy, tobj):
        m.train()
    with torch.no_grad():
        for _ in range(3):
            tx(x_dict)
            txy(x_dict, torch.from_numpy(y))
            tobj(x_dict, torch.from_numpy(z))
    for m in (tx, txy, tobj):
        m.eval()

    with torch.no_grad():
        _, mux, logvarx = tx(x_dict)
        _, muxy, logvarxy = txy(x_dict, torch.from_numpy(y))
        box_pred = tobj(x_dict, torch.from_numpy(z))

    sd = {}
    for prefix, m in (("x_encoder", tx), ("xy_encoder", txy), ("obj_encoder", tobj)):
        for k, v in m.state_dict().items():
            if "num_batches_tracked" in k:
                continue
            sd[f"{prefix}.{k}"] = v.numpy()
    variables = convert_glenet(sd)

    from lidarcrafter_tpu.metrics.models.glenet import LatentEncoder, ObjectFeatEncoder

    jpts = jnp.asarray(pts.transpose(0, 2, 1))  # ours: (B, N, C)
    jtext = jnp.asarray(text)

    def sub(name):
        return {"params": variables["params"][name],
                "batch_stats": variables["batch_stats"][name]}

    mu, logvar = LatentEncoder(3).apply(sub("x_encoder"), jpts, jtext)
    np.testing.assert_allclose(np.asarray(mu), mux.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar), logvarx.numpy(), rtol=1e-4, atol=1e-5)

    mu2, logvar2 = LatentEncoder(3, conditional=True).apply(
        sub("xy_encoder"), jpts, jtext, jnp.asarray(y)
    )
    np.testing.assert_allclose(np.asarray(mu2), muxy.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar2), logvarxy.numpy(), rtol=1e-4, atol=1e-5)

    got = ObjectFeatEncoder(3, 2).apply(sub("obj_encoder"), jpts, jtext, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), box_pred.numpy(), rtol=1e-4, atol=1e-5)
