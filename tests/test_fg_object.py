"""Object-level metrics: CGF/RGF/DCF drivers."""

import numpy as np

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.metrics.fg_object import (
    compute_cgf,
    compute_classification_metrics_fixed_bins,
    compute_dcf,
    compute_regression_metrics_fixed_bins,
    precision_recall_f1,
)


def test_precision_recall_f1_matches_sklearn_semantics():
    y_true = np.array([0, 0, 1, 1, 2, 2])
    y_pred = np.array([0, 1, 1, 1, 2, 0])
    p, r, f, s = precision_recall_f1(y_true, y_pred, 3)
    np.testing.assert_allclose(p, [1 / 2, 2 / 3, 1.0])
    np.testing.assert_allclose(r, [1 / 2, 1.0, 1 / 2])
    np.testing.assert_array_equal(s, [2, 2, 2])


def test_classification_bins():
    res = {
        "class_names": ["car", "ped"],
        "test_true": [0, 0, 1, 1],
        "test_pred": [0, 1, 1, 1],
        "num_points_in_gt": [50, 150, 250, 600],
    }
    out = compute_classification_metrics_fixed_bins(res)
    assert out["overall"]["accuracy"] == 0.75
    assert set(out["partitions"]) == {"<100", "100-200", "200-300", ">500"}
    assert out["partitions"]["<100"]["accuracy"] == 1.0
    assert out["partitions"]["100-200"]["accuracy"] == 0.0


def test_cgf_driver_with_pointmlp():
    from lidarcrafter_tpu.metrics.extractor.pointmlp import point_mlp

    m = point_mlp(num_classes=4, points=64, embed_dim=8,
                  pre_blocks=(1,), pos_blocks=(1,), dim_expansion=(2,),
                  k_neighbors=(8,), reducers=(2,))
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)))
    apply = jax.jit(lambda pts: m.apply(variables, pts))
    rng = np.random.RandomState(0)
    clouds = [rng.randn(64, 3).astype(np.float32) for _ in range(6)]
    out = compute_cgf(
        apply, clouds, labels=[0, 1, 2, 3, 0, 1],
        num_points_in_gt=[50, 150, 250, 350, 450, 550],
        class_names=["car", "truck", "bus", "ped"],
    )
    assert 0.0 <= out["overall"]["accuracy"] <= 1.0
    assert len(out["partitions"]) == 6


def test_rgf_bins():
    recs = {
        "a": {"variance": [0.1, 0.2], "overlap": 0.8, "pointnum": 100},
        "b": {"variance": [0.3, 0.4], "overlap": 0.6, "pointnum": 200},
        "c": {"variance": [0.5, 0.6], "overlap": 0.4, "pointnum": 400},
    }
    out = compute_regression_metrics_fixed_bins(recs)
    np.testing.assert_allclose(out["overall"]["variance"], [0.3, 0.4])
    np.testing.assert_allclose(out["overall"]["overlap"], 0.6)
    assert set(out["partitions"]) == {"<150", "150-300", ">300"}


def test_dcf():
    dets = {
        "car": [{"name": "car", "score": 0.9}, {"name": "car", "score": 0.7}],
        "bus": [{"name": "bus", "score": 0.5}],
        "barrier": [{"name": "barrier", "score": 0.1}],  # filtered out
    }
    out = compute_dcf(dets)
    assert out == {"car": 0.8, "bus": 0.5}


def test_pointmlp_classifier_training_learns():
    """3-step training on separable toy data: loss decreases, stats update."""
    from lidarcrafter_tpu.metrics.extractor.pointmlp import point_mlp
    from lidarcrafter_tpu.training.classifier import (
        make_classifier_optimizer,
        make_classifier_train_step,
        smoothed_cross_entropy,
    )

    # smoothed CE sanity: the smoothing-optimal prediction (p = [0.8, 0.2])
    # beats uniform, and the minimum equals the smoothed-target entropy
    good = jnp.asarray([[np.log(0.8), np.log(0.2)]])
    bad = jnp.asarray([[0.0, 0.0]])
    lab = jnp.asarray([0])
    g = float(smoothed_cross_entropy(good, lab))
    assert g < float(smoothed_cross_entropy(bad, lab))
    np.testing.assert_allclose(g, -(0.8 * np.log(0.8) + 0.2 * np.log(0.2)), rtol=1e-5)

    m = point_mlp(num_classes=2, points=32, embed_dim=8,
                  pre_blocks=(1,), pos_blocks=(1,), dim_expansion=(2,),
                  k_neighbors=(4,), reducers=(2,))
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.randn(4, 32, 3) + 3, rng.randn(4, 32, 3) - 3]
    ).astype(np.float32)
    labels = np.array([0] * 4 + [1] * 4)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(pts[:1]))
    tx = make_classifier_optimizer(lr=0.05, epochs=10, steps_per_epoch=1)
    opt_state = tx.init(variables["params"])
    step = make_classifier_train_step(m, tx)
    batch = {"points": jnp.asarray(pts), "labels": jnp.asarray(labels)}
    losses = []
    for i in range(4):
        variables, opt_state, loss, acc = step(
            variables, opt_state, batch, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_rangenet_segmentation_training():
    from lidarcrafter_tpu.metrics.extractor.rangenet import RangeNet
    from lidarcrafter_tpu.training.segmentation import (
        make_segmentation_train_step,
        mean_iou,
        weighted_pixel_cross_entropy,
    )
    import optax

    # loss semantics: perfect prediction ≈ 0, ignore pixels excluded
    logits = jnp.zeros((1, 2, 2, 3)).at[..., 1].set(10.0)
    labels = jnp.asarray([[[1, 1], [1, -1]]])
    l = float(weighted_pixel_cross_entropy(logits, labels))
    assert l < 1e-3
    labels_bad = jnp.asarray([[[0, 0], [0, -1]]])
    assert float(weighted_pixel_cross_entropy(logits, labels_bad)) > 1.0
    assert float(mean_iou(logits, labels, 3)) == 1.0

    # 2 steps of training on a tiny RangeNet reduce the loss
    net = RangeNet(num_classes=3, in_ch=5, backbone=21)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 64, 5)))
    tx = optax.adam(1e-3)
    step = make_segmentation_train_step(lambda p, img: net.apply(p, img), tx)
    opt_state = tx.init(params)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(1, 8, 64, 5).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 3, (1, 8, 64))),
    }
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
