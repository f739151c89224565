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
