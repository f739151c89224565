"""Training loop driver.

Replaces the reference's per-workload scripts (``tools/train/train_lidm.py:38``,
``train_lidm_cond.py:31`` — one Accelerate/DDP loop each) with a single
:class:`Trainer` parameterized by the named config: factory → optax → jitted
train step on the dp/sp mesh → EMA → periodic orbax checkpoints.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import batch_sharding, make_mesh, replicated_sharding
from ..utils.profiling import StepTimer
from .checkpoint import save_checkpoint
from .factory import build_diffusion_training
from .optim import cosine_warmup_schedule, make_optimizer
from .preprocess import preprocess_autoregressive_cond, preprocess_condition_mask, preprocess_x0
from .state import TrainState
from .tracker import render_sample_images
from .train_step import make_train_step


class Trainer:
    """Unconditional / concat-conditioned diffusion trainer.

    ``data_iter`` yields collated numpy batches (NuscDataset.collate_fn
    format); conditioning channels are derived on-device per step.
    """

    def __init__(
        self,
        cfg,
        data_iter: Iterator[dict],
        mesh=None,
        output_dir: str | None = None,
        log_fn: Callable[[dict], None] | None = print,
        tracker=None,
        profile_dir: str | None = None,
        preview_num_steps: int | None = None,
        preview_batch_size: int | None = None,
    ):
        self.cfg = cfg
        self.data_iter = data_iter
        self.log_fn = log_fn
        self.output_dir = Path(output_dir or cfg.training.output_dir)
        self.models, self.engine, self.lidar_utils = build_diffusion_training(cfg)
        self.is_cond = isinstance(self.models, dict)
        self.mesh = mesh if mesh is not None else make_mesh(sp=1)
        # observability (cf. train_lidm.py:57-73,173-198,237-244)
        self.tracker = tracker
        self.profile_dir = profile_dir
        self.preview_num_steps = preview_num_steps or cfg.diffusion.num_sampling_steps
        self.preview_batch_size = preview_batch_size or cfg.training.batch_size_eval
        self.lr_schedule = cosine_warmup_schedule(
            cfg.training.lr, cfg.training.lr_warmup_steps, cfg.training.num_steps
        )

        self.tx = make_optimizer(
            lr=cfg.training.lr,
            warmup_steps=cfg.training.lr_warmup_steps,
            num_steps=cfg.training.num_steps,
            b1=cfg.training.adam_beta1,
            b2=cfg.training.adam_beta2,
            eps=cfg.training.adam_epsilon,
            weight_decay=cfg.training.adam_weight_decay,
            grad_accum_steps=cfg.training.gradient_accumulation_steps,
        )

    # ------------------------------------------------------------------ init

    def init_state(self, rng: jax.Array) -> TrainState:
        H, W = self.cfg.data.resolution
        if self.is_cond:
            cond_model = self.models["cond"]
            model = self.models["model"]
            L = self.cfg.condition_model.params.get("layout_length", 13)
            cond_in = {
                "scaled_gt_boxes": jnp.zeros((1, L, 9)),
                "gt_boxes_2d": jnp.zeros((1, L, 4)),
                "is_valid_obj": jnp.ones((1, L)),
                "concat_cond": jnp.zeros(
                    (1, H, W, self.cfg.condition_model.params["out_channels"])
                ),
            }
            r1, r2 = jax.random.split(rng)
            cond_params = cond_model.init(r1, cond_in)
            layout = cond_model.apply(cond_params, cond_in)
            cd = {"time_condition": jnp.zeros((1,)), "other_condition": layout}
            model_params = model.init(r1, jnp.zeros((1, H, W, 2)), cd)
            params = {"model": model_params, "cond": cond_params}
        else:
            params = self.models.init(
                rng, jnp.zeros((1, H, W, 2)), jnp.zeros((1,))
            )
        return TrainState.create(params, self.tx)

    # ------------------------------------------------------------ batch prep

    def prepare_batch(self, batch: dict) -> Any:
        """Numpy collated batch → engine input; cf.
        ``train_lidm_cond.py:259-283``."""
        jb = {
            k: jnp.asarray(v)
            for k, v in batch.items()
            if isinstance(v, np.ndarray)
        }
        x_0 = preprocess_x0(
            jb, self.lidar_utils,
            self.cfg.data.train_depth, self.cfg.data.train_reflectance,
        )
        if not self.is_cond:
            return x_0
        input_dict = dict(jb)
        input_dict["x_0"] = x_0
        if "condition_mask" in jb:
            input_dict["concat_cond"] = preprocess_condition_mask(
                jb, self.lidar_utils, len(self.cfg.data.class_names)
            )
        if "autoregressive_cond" in jb:
            input_dict["autoregressive_cond"] = preprocess_autoregressive_cond(
                jb["autoregressive_cond"], self.lidar_utils,
                include_reflectance=False,
            )
        return input_dict

    # -------------------------------------------------------------- preview

    def preview_images(self, state: TrainState, rng: jax.Array,
                       batch=None) -> dict:
        """DDIM-sample with EMA weights and render depth/BEV/reflectance
        images; cf. ``train_lidm.py:237-244`` + its ``log_images``."""
        if self.is_cond:
            if batch is None:
                return {}
            bs = int(batch["x_0"].shape[0]) if "x_0" in batch \
                else self.preview_batch_size
            sample = self.engine.sample(
                state.ema_params, rng, batch, batch_size=bs,
                num_steps=self.preview_num_steps, mode="ddim",
            )
        else:
            sample = self.engine.sample(
                state.ema_params, rng, self.preview_batch_size,
                self.preview_num_steps, mode="ddim",
            )
        return render_sample_images(
            sample, self.lidar_utils,
            train_depth=self.cfg.data.train_depth,
            train_reflectance=self.cfg.data.train_reflectance,
        )

    # ------------------------------------------------------------------ run

    def train(
        self,
        num_steps: int | None = None,
        rng: jax.Array | None = None,
        state: TrainState | None = None,
        checkpoint_every: int | None = None,
        preview_every: int | None = None,
        log_every: int = 50,
    ) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.training.seed)
        num_steps = num_steps or self.cfg.training.num_steps
        checkpoint_every = checkpoint_every or self.cfg.training.steps_save_model
        preview_every = preview_every if preview_every is not None \
            else self.cfg.training.steps_save_image

        if state is None:
            state = self.init_state(rng)
        state = jax.device_put(state, replicated_sharding(self.mesh))

        step_fn = make_train_step(
            self.engine,
            self.tx,
            ema_beta=self.cfg.training.ema_decay,
            ema_update_every=self.cfg.training.ema_update_every,
            ema_update_after_step=self.cfg.training.lr_warmup_steps
            * self.cfg.training.gradient_accumulation_steps,
        )

        timer = StepTimer()
        profiling = False
        prepared = None
        while int(jax.device_get(state.step)) < num_steps:
            batch = next(self.data_iter)
            prepared = self.prepare_batch(batch)
            prepared = jax.tree_util.tree_map(
                lambda a: jax.device_put(
                    a, batch_sharding(self.mesh, getattr(a, "ndim", 1))
                ),
                prepared,
            )
            state, loss = step_fn(state, prepared, rng)
            step = int(jax.device_get(state.step))
            timer.tick()

            # capture a 3-step XProf trace once past compile warmup
            if self.profile_dir and step == 3 and not profiling:
                jax.profiler.start_trace(self.profile_dir)
                profiling = True
            elif profiling and step >= 6:
                jax.profiler.stop_trace()
                profiling = False

            if step % log_every == 0 or step <= 2:
                log = {
                    "step": step,
                    "loss": float(jax.device_get(loss)),
                    "lr": float(self.lr_schedule(step)),
                    "sec_per_step": timer.mean,
                }
                if self.log_fn is not None:
                    self.log_fn(log)
                if self.tracker is not None:
                    self.tracker.log(
                        {k: v for k, v in log.items() if k != "step"}, step
                    )
            if (
                self.tracker is not None
                and preview_every
                and step % preview_every == 0
            ):
                try:
                    images = self.preview_images(state, rng, prepared)
                    if images:
                        self.tracker.log_images(images, step)
                except Exception as e:  # previews must never kill training
                    if self.log_fn is not None:
                        self.log_fn({"step": step, "preview_error": str(e)})
            if checkpoint_every and step % checkpoint_every == 0:
                save_checkpoint(
                    str(self.output_dir / f"ckpt_{step:010d}"), state, self.cfg
                )
        if profiling:
            jax.profiler.stop_trace()
        return state


class FlowTrainer(Trainer):
    """MeanFlow branch trainer (meanflow-nusc); cf. ``tools/train/train_flow.py``."""

    def __init__(self, cfg, data_iter, **kw):
        super(Trainer, self).__init__()  # bypass Trainer.__init__
        from .factory import build_flow_training

        self.cfg = cfg
        self.data_iter = data_iter
        self.log_fn = kw.get("log_fn", print)
        self.output_dir = Path(kw.get("output_dir") or cfg.training.output_dir)
        self.models, self.engine, self.lidar_utils = build_flow_training(cfg)
        self.is_cond = False
        self.mesh = kw.get("mesh") or make_mesh(sp=1)
        self.tx = make_optimizer(
            lr=cfg.training.lr,
            warmup_steps=cfg.training.lr_warmup_steps,
            num_steps=cfg.training.num_steps,
            b1=cfg.training.adam_beta1,
            b2=cfg.training.adam_beta2,
            eps=cfg.training.adam_epsilon,
            weight_decay=cfg.training.adam_weight_decay,
            grad_accum_steps=cfg.training.gradient_accumulation_steps,
        )

    def init_state(self, rng):
        H, W = self.cfg.data.resolution
        params = self.models.init(
            rng, jnp.zeros((1, H, W, 2)), jnp.zeros((1,)), jnp.zeros((1,))
        )
        return TrainState.create(params, self.tx)

    def train(self, num_steps=None, rng=None, state=None, checkpoint_every=None):
        import optax

        from .ema import ema_update

        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.training.seed)
        num_steps = num_steps or self.cfg.training.num_steps
        if state is None:
            state = self.init_state(rng)
        engine, tx, cfg = self.engine, self.tx, self.cfg

        @jax.jit
        def step_fn(state, x_0, rng):
            step_rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                loss, mse = engine.loss(params, step_rng, x_0)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = ema_update(
                state.ema_params, params, state.step,
                beta=cfg.training.ema_decay,
                update_every=cfg.training.ema_update_every,
                update_after_step=cfg.training.lr_warmup_steps,
            )
            return state.replace(
                step=state.step + 1, params=params,
                ema_params=ema_params, opt_state=opt_state,
            ), loss

        while int(jax.device_get(state.step)) < num_steps:
            batch = next(self.data_iter)
            x_0 = self.prepare_batch(batch)
            state, loss = step_fn(state, x_0, rng)
            step = int(jax.device_get(state.step))
            if self.log_fn is not None and step % 50 == 0:
                self.log_fn({"step": step, "loss": float(jax.device_get(loss))})
            if checkpoint_every and step % checkpoint_every == 0:
                save_checkpoint(str(self.output_dir / f"ckpt_{step:010d}"), state, self.cfg)
        return state


class ObjectTrainer(Trainer):
    """Per-object point diffusion trainer (nuscenes-object);
    cf. ``tools/train/train_object.py``.  ``data_iter`` yields the
    NuscObjectDataset collate format + a ``fg_text_features`` table."""

    def __init__(self, cfg, data_iter, text_features, **kw):
        super(Trainer, self).__init__()
        from .factory import build_object_training

        self.cfg = cfg
        self.data_iter = data_iter
        self.text_features = jnp.asarray(text_features)
        self.log_fn = kw.get("log_fn", print)
        self.output_dir = Path(kw.get("output_dir") or cfg.training.output_dir)
        self.models, self.engine, self.lidar_utils = build_object_training(cfg)
        self.is_cond = True
        self.mesh = kw.get("mesh") or make_mesh(sp=1)
        self.tx = make_optimizer(
            lr=cfg.training.lr,
            warmup_steps=cfg.training.lr_warmup_steps,
            num_steps=cfg.training.num_steps,
            grad_accum_steps=cfg.training.gradient_accumulation_steps,
        )

    def init_state(self, rng):
        N = self.cfg.data.num_samples
        D = self.cfg.model.params["point_dim"]
        input_dict = {
            "fg_encoding_box": jnp.zeros((1, 6)),
            "fg_class": jnp.zeros((1,), jnp.int32),
            "fg_text_features": self.text_features,
        }
        r1, r2 = jax.random.split(rng)
        cond_params = self.models["cond"].init(r1, input_dict)
        feat = self.models["cond"].apply(cond_params, input_dict)
        cd = {"time_condition": jnp.zeros((1,)), "other_condition": feat}
        model_params = self.models["model"].init(r2, jnp.zeros((1, N, D)), cd)
        return TrainState.create({"model": model_params, "cond": cond_params}, self.tx)

    def prepare_batch(self, batch):
        return {
            "x_0": jnp.asarray(batch["fg_points"]),
            "fg_encoding_box": jnp.asarray(batch["fg_encoding_box"]),
            "fg_class": jnp.asarray(batch["fg_class"]),
            "fg_text_features": self.text_features,
        }

    def train(self, num_steps=None, rng=None, state=None, checkpoint_every=None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.training.seed)
        num_steps = num_steps or self.cfg.training.num_steps
        if state is None:
            state = self.init_state(rng)
        step_fn = make_train_step(
            self.engine, self.tx,
            ema_beta=self.cfg.training.ema_decay,
            ema_update_every=self.cfg.training.ema_update_every,
            ema_update_after_step=self.cfg.training.lr_warmup_steps,
            donate=False,
        )
        while int(jax.device_get(state.step)) < num_steps:
            batch = self.prepare_batch(next(self.data_iter))
            state, loss = step_fn(state, batch, rng)
            step = int(jax.device_get(state.step))
            if self.log_fn is not None and step % 50 == 0:
                self.log_fn({"step": step, "loss": float(jax.device_get(loss))})
            if checkpoint_every and step % checkpoint_every == 0:
                save_checkpoint(str(self.output_dir / f"ckpt_{step:010d}"), state, self.cfg)
        return state


def pad_layout_batch(collated: dict, max_nodes: int, max_edges: int) -> dict:
    """Collated scene-graph batch (decoder side of
    :func:`~lidarcrafter_tpu.datasets.scene_graph.collate_scene_graphs`) →
    fixed-shape engine input (static node/edge budgets for jit).

    Padded nodes carry zero loss weight (boxes[:, 20:] = 0) and scene_id 0;
    padded triples point at node 0 with ``edge_mask`` False.
    """
    dec = collated["decoder"] if "decoder" in collated else collated
    boxes = np.asarray(dec["boxes"], np.float32)
    objs = np.asarray(dec["objs"], np.int64)
    triples = np.asarray(dec.get("tripltes", dec.get("triples")), np.int64).reshape(-1, 3)
    n, e = len(objs), len(triples)
    if n > max_nodes or e > max_edges:
        raise ValueError(f"batch ({n} nodes, {e} edges) exceeds budgets "
                         f"({max_nodes}, {max_edges})")
    D = boxes.shape[1]
    boxes_p = np.zeros((max_nodes, D), np.float32)
    boxes_p[:n] = boxes
    objs_p = np.zeros((max_nodes,), np.int64)
    objs_p[:n] = objs
    scene_p = np.zeros((max_nodes,), np.int64)
    scene_p[:n] = np.asarray(dec["obj_to_scene"], np.int64)
    tf = np.asarray(dec["text_feats"], np.float32)
    rf = np.asarray(dec["rel_feats"], np.float32)
    tf_p = np.zeros((max_nodes, tf.shape[1] if tf.ndim == 2 else 512), np.float32)
    rf_p = np.zeros((max_edges, rf.shape[1] if rf.ndim == 2 else 512), np.float32)
    if n:
        tf_p[:n] = tf
    if e:
        rf_p[:e] = rf
    trip_p = np.zeros((max_edges, 3), np.int64)
    trip_p[:e] = triples
    return {
        "boxes": jnp.asarray(boxes_p),
        "scene_ids": jnp.asarray(scene_p),
        "scenegraph": {
            "objs": jnp.asarray(objs_p),
            "triples": jnp.asarray(trip_p),
            "text_feats": jnp.asarray(tf_p),
            "rel_feats": jnp.asarray(rf_p),
            "edge_mask": jnp.asarray(np.arange(max_edges) < e),
        },
    }


class LayoutTrainer(Trainer):
    """Scene-graph → 1D layout diffusion trainer (nuscenes-layout);
    cf. ``tools/train/train_layout.py:29-213``.  ``data_iter`` yields
    collated scene-graph batches (``collate_scene_graphs`` format)."""

    def __init__(self, cfg, data_iter, max_nodes: int = 64,
                 max_edges: int = 128, **kw):
        super(Trainer, self).__init__()
        from .factory import build_layout_training

        self.cfg = cfg
        self.data_iter = data_iter
        self.max_nodes, self.max_edges = max_nodes, max_edges
        self.log_fn = kw.get("log_fn", print)
        self.output_dir = Path(kw.get("output_dir") or cfg.training.output_dir)
        self.models, self.engine, self.lidar_utils = build_layout_training(
            cfg,
            num_objs=kw.get("num_objs", 9),
            num_preds=kw.get("num_preds", 16),
        )
        self.is_cond = True
        self.mesh = kw.get("mesh") or make_mesh(sp=1)
        self.tx = make_optimizer(
            lr=cfg.training.lr,
            warmup_steps=cfg.training.lr_warmup_steps,
            num_steps=cfg.training.num_steps,
            grad_accum_steps=cfg.training.gradient_accumulation_steps,
        )

    def init_state(self, rng):
        g = {
            "objs": jnp.zeros((self.max_nodes,), jnp.int64),
            "triples": jnp.zeros((self.max_edges, 3), jnp.int64),
            "text_feats": jnp.zeros((self.max_nodes, 512)),
            "rel_feats": jnp.zeros((self.max_edges, 512)),
            "edge_mask": jnp.zeros((self.max_edges,), bool),
        }
        r1, r2 = jax.random.split(rng)
        cond_params = self.models["cond"].init(
            r1, g["objs"], g["triples"], g["text_feats"], g["rel_feats"],
            edge_mask=g["edge_mask"],
        )
        _, obj_embed = self.models["cond"].apply(
            cond_params, g["objs"], g["triples"], g["text_feats"],
            g["rel_feats"], edge_mask=g["edge_mask"],
        )
        cd = {
            "time_condition": jnp.zeros((self.max_nodes,)),
            "other_condition": {
                "preds": g["triples"],
                "uc_b": obj_embed,
                "edge_mask": g["edge_mask"],
            },
        }
        D = self.cfg.model.params.get("in_channels", 20)
        model_params = self.models["model"].init(
            r2, jnp.zeros((self.max_nodes, D)), cd
        )
        return TrainState.create(
            {"model": model_params, "cond": cond_params}, self.tx
        )

    def train(self, num_steps=None, rng=None, state=None, checkpoint_every=None):
        import optax

        from .ema import ema_update

        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.training.seed)
        num_steps = num_steps or self.cfg.training.num_steps
        if state is None:
            state = self.init_state(rng)
        engine, tx, cfg = self.engine, self.tx, self.cfg
        B = cfg.training.batch_size_train

        @jax.jit
        def step_fn(state, batch, rng):
            step_rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                return engine.loss(params, step_rng, batch, num_scenes=B)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = ema_update(
                state.ema_params, params, state.step,
                beta=cfg.training.ema_decay,
                update_every=cfg.training.ema_update_every,
                update_after_step=cfg.training.lr_warmup_steps,
            )
            return state.replace(
                step=state.step + 1, params=params,
                ema_params=ema_params, opt_state=opt_state,
            ), loss

        while int(jax.device_get(state.step)) < num_steps:
            batch = next(self.data_iter)
            if "scenegraph" not in batch:
                batch = pad_layout_batch(batch, self.max_nodes, self.max_edges)
            state, loss = step_fn(state, batch, rng)
            step = int(jax.device_get(state.step))
            if self.log_fn is not None and (step % 50 == 0 or step <= 2):
                self.log_fn({"step": step, "loss": float(jax.device_get(loss))})
            if checkpoint_every and step % checkpoint_every == 0:
                save_checkpoint(str(self.output_dir / f"ckpt_{step:010d}"), state, self.cfg)
        return state
