"""End-to-end 1D layout diffusion branch: SceneGraph cond → UNet1D → engine."""

import numpy as np

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.configs import get_config
from lidarcrafter_tpu.training.factory import build_layout_training


def _graph(num_scenes=2, nodes_per_scene=5, edges_per_scene=6, seed=0):
    r = np.random.RandomState(seed)
    N = num_scenes * nodes_per_scene
    T = num_scenes * edges_per_scene
    objs = r.randint(0, 9, N)
    # edges within each scene (global node indexing, like the reference collate)
    triples = []
    for s in range(num_scenes):
        base = s * nodes_per_scene
        for _ in range(edges_per_scene):
            triples.append(
                [base + r.randint(nodes_per_scene), r.randint(16), base + r.randint(nodes_per_scene)]
            )
    scene_ids = np.repeat(np.arange(num_scenes), nodes_per_scene)
    boxes = r.randn(N, 40).astype(np.float32)
    boxes[:, 20:] = 1.0  # all valid
    return {
        "boxes": jnp.asarray(boxes),
        "scene_ids": jnp.asarray(scene_ids),
        "scenegraph": {
            "objs": jnp.asarray(objs),
            "triples": jnp.asarray(np.asarray(triples, np.int32)),
            "text_feats": jnp.asarray(r.randn(N, 512).astype(np.float32)),
            "rel_feats": jnp.asarray(r.randn(T, 512).astype(np.float32)),
            "edge_mask": jnp.ones((T,), bool),
        },
    }


def test_layout_branch_loss_and_sample():
    cfg = get_config("nuscenes-layout")
    cfg.model.params["model_channels"] = 64  # shrink for test
    models, engine, _ = build_layout_training(cfg)
    input_dict = _graph()

    # init both models
    rng = jax.random.PRNGKey(0)
    cond_params = models["cond"].init(
        rng,
        input_dict["scenegraph"]["objs"],
        input_dict["scenegraph"]["triples"],
        input_dict["scenegraph"]["text_feats"],
        input_dict["scenegraph"]["rel_feats"],
        edge_mask=input_dict["scenegraph"]["edge_mask"],
    )
    latent, obj_embed = models["cond"].apply(
        cond_params,
        input_dict["scenegraph"]["objs"],
        input_dict["scenegraph"]["triples"],
        input_dict["scenegraph"]["text_feats"],
        input_dict["scenegraph"]["rel_feats"],
        edge_mask=input_dict["scenegraph"]["edge_mask"],
    )
    cd = {
        "time_condition": jnp.zeros((10,)),
        "other_condition": {
            "preds": input_dict["scenegraph"]["triples"],
            "uc_b": obj_embed,
            "edge_mask": input_dict["scenegraph"]["edge_mask"],
        },
    }
    model_params = models["model"].init(
        jax.random.PRNGKey(1), input_dict["boxes"][:, :20], cd
    )
    params = {"model": model_params, "cond": cond_params}

    loss = engine.loss(params, jax.random.PRNGKey(2), input_dict, num_scenes=2)
    assert np.isfinite(float(loss))

    out = engine.sample(params, jax.random.PRNGKey(3), input_dict, num_steps=2, mode="ddim")
    assert out.shape == (10, 20)
    assert np.isfinite(np.asarray(out)).all()


def test_per_scene_shared_timesteps():
    cfg = get_config("nuscenes-layout")
    _, engine, _ = build_layout_training(cfg)
    scene_ids = jnp.asarray(np.repeat(np.arange(3), 4))
    t = engine.sample_timesteps(jax.random.PRNGKey(0), scene_ids, 3)
    t = np.asarray(t)
    assert t.shape == (12,)
    for s in range(3):
        seg = t[s * 4 : (s + 1) * 4]
        assert np.all(seg == seg[0])
    assert len(np.unique(t)) == 3
