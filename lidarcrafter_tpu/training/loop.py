"""Training loop driver.

Replaces the reference's per-workload scripts (``tools/train/train_lidm.py:38``,
``train_lidm_cond.py:31``, ``train_flow.py``, ``train_object.py``,
``train_layout.py:29-213`` — one Accelerate/DDP loop each) with ONE
:class:`Trainer` loop body shared by all four workloads: factory → optax →
jitted train step on the dp/sp mesh → EMA → tracker/preview/profiling →
periodic orbax checkpoints → resume.  Subclasses override only the model
builder, state init, and batch preparation.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import batch_sharding, make_mesh, replicated_sharding
from ..utils.profiling import StepTimer
from .checkpoint import restore_checkpoint, save_checkpoint
from .factory import build_diffusion_training
from .optim import cosine_warmup_schedule, make_optimizer
from .preprocess import preprocess_autoregressive_cond, preprocess_condition_mask, preprocess_x0
from .state import TrainState
from .tracker import render_sample_images
from .train_step import make_train_step


def latest_checkpoint(output_dir: str | Path) -> str | None:
    """Newest ``ckpt_*`` under ``output_dir`` (step-ordered), or None."""
    ckpts = sorted(Path(output_dir).glob("ckpt_*"))
    return str(ckpts[-1]) if ckpts else None


class Trainer:
    """Unconditional / concat-conditioned diffusion trainer.

    ``data_iter`` yields collated numpy batches (NuscDataset.collate_fn
    format); conditioning channels are derived on-device per step.
    """

    donate = True          # donate the train state into the jitted step
    loss_has_aux = False   # engine.loss returns (loss, aux) instead of loss

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
        **build_kwargs,
    ):
        self.cfg = cfg
        self.data_iter = data_iter
        self.log_fn = log_fn
        self.output_dir = Path(output_dir or cfg.training.output_dir)
        self.models, self.engine, self.lidar_utils = self._build(cfg, **build_kwargs)
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

    # --------------------------------------------------------------- builder

    def _build(self, cfg, **kw):
        return build_diffusion_training(cfg)

    def _loss_kwargs(self) -> dict:
        """Extra kwargs for ``engine.loss`` (see subclass overrides)."""
        return {}

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

    def _shard_batch(self, prepared):
        """dp-shard batch arrays whose leading dim divides the dp axis;
        replicate the rest (e.g. shared lookup tables, graph-node axes that
        don't align with the mesh)."""
        dp = self.mesh.shape.get("dp", 1)

        def put(a):
            ndim = getattr(a, "ndim", 0)
            if ndim >= 1 and a.shape[0] % dp == 0:
                return jax.device_put(a, batch_sharding(self.mesh, ndim))
            return jax.device_put(a, replicated_sharding(self.mesh))

        return jax.tree_util.tree_map(put, prepared)

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

    # ---------------------------------------------------------------- resume

    def resume_state(self, resume: str, rng: jax.Array) -> TrainState:
        """Restore params/EMA/opt_state/step from an orbax checkpoint (cf.
        ``train_lidm.py:294-300`` / ``inference.py:335-344``: the reference
        restores weights, EMA, optimizer, scheduler and global_step).
        ``resume='auto'`` picks the newest ``ckpt_*`` in ``output_dir``."""
        path = latest_checkpoint(self.output_dir) if resume == "auto" else resume
        if path is None:
            if self.log_fn is not None:
                self.log_fn({"resume": "no checkpoint found, fresh start"})
            return self.init_state(rng)
        template = self.init_state(rng)
        state, _ = restore_checkpoint(path, template)
        if self.log_fn is not None:
            self.log_fn({"resume": path, "step": int(state.step)})
        return state

    # ------------------------------------------------------------------ run

    def train(
        self,
        num_steps: int | None = None,
        rng: jax.Array | None = None,
        state: TrainState | None = None,
        checkpoint_every: int | None = None,
        preview_every: int | None = None,
        log_every: int = 50,
        resume: str | None = None,
    ) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.training.seed)
        num_steps = num_steps or self.cfg.training.num_steps
        checkpoint_every = checkpoint_every or self.cfg.training.steps_save_model
        preview_every = preview_every if preview_every is not None \
            else self.cfg.training.steps_save_image

        if state is None:
            state = self.resume_state(resume, rng) if resume else self.init_state(rng)
        state = jax.device_put(state, replicated_sharding(self.mesh))

        step_fn = make_train_step(
            self.engine,
            self.tx,
            ema_beta=self.cfg.training.ema_decay,
            ema_update_every=self.cfg.training.ema_update_every,
            ema_update_after_step=self.cfg.training.lr_warmup_steps
            * self.cfg.training.gradient_accumulation_steps,
            donate=self.donate,
            loss_kwargs=self._loss_kwargs(),
            loss_has_aux=self.loss_has_aux,
            amp=self.cfg.training.mixed_precision == "bf16",
        )

        timer = StepTimer()
        profiling = False
        prepared = None
        while int(jax.device_get(state.step)) < num_steps:
            batch = next(self.data_iter)
            prepared = self._shard_batch(self.prepare_batch(batch))
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
    """MeanFlow branch trainer (meanflow-nusc); cf. ``tools/train/train_flow.py``.

    The MeanFlow engine's loss returns ``(adaptive_loss, mse)`` — the shared
    step selects the scalar via ``loss_has_aux``."""

    loss_has_aux = True

    def _build(self, cfg, **kw):
        from .factory import build_flow_training

        return build_flow_training(cfg)

    def init_state(self, rng):
        H, W = self.cfg.data.resolution
        params = self.models.init(
            rng, jnp.zeros((1, H, W, 2)), jnp.zeros((1,)), jnp.zeros((1,))
        )
        return TrainState.create(params, self.tx)

    def preview_images(self, state, rng, batch=None):
        # MeanFlow is 1-step: sample(params, rng, batch_size) takes no
        # num_steps/mode (mean_flow.py:78) — the base preview call would
        # TypeError (and be swallowed by the preview try/except)
        sample = self.engine.sample(
            state.ema_params, rng, batch_size=self.preview_batch_size
        )
        return render_sample_images(
            sample, self.lidar_utils,
            train_depth=self.cfg.data.train_depth,
            train_reflectance=self.cfg.data.train_reflectance,
        )


class ObjectTrainer(Trainer):
    """Per-object point diffusion trainer (nuscenes-object);
    cf. ``tools/train/train_object.py``.  ``data_iter`` yields the
    NuscObjectDataset collate format + a ``fg_text_features`` table."""

    donate = False  # fg_text_features is re-fed every step; donation would
    # invalidate the shared table buffer

    def __init__(self, cfg, data_iter, text_features, **kw):
        self.text_features = jnp.asarray(text_features)
        super().__init__(cfg, data_iter, **kw)

    def _build(self, cfg, **kw):
        from .factory import build_object_training

        return build_object_training(cfg)

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


def pad_layout_batch(collated: dict, max_nodes: int, max_edges: int) -> dict:
    """Collated scene-graph batch (decoder side of
    :func:`~lidarcrafter_tpu.datasets.scene_graph.collate_scene_graphs`) →
    fixed-shape engine input (static node/edge budgets for jit).

    Padded nodes carry zero loss weight (boxes[:, 20:] = 0) and scene_id 0;
    padded triples point at node 0 with ``edge_mask`` False.
    """
    dec = collated["decoder"] if "decoder" in collated else collated
    boxes = np.asarray(dec["boxes"], np.float32)
    objs = np.asarray(dec["objs"], np.int32)
    triples = np.asarray(dec.get("tripltes", dec.get("triples")), np.int32).reshape(-1, 3)
    n, e = len(objs), len(triples)
    if n > max_nodes or e > max_edges:
        raise ValueError(f"batch ({n} nodes, {e} edges) exceeds budgets "
                         f"({max_nodes}, {max_edges})")
    D = boxes.shape[1]
    boxes_p = np.zeros((max_nodes, D), np.float32)
    boxes_p[:n] = boxes
    objs_p = np.zeros((max_nodes,), np.int32)
    objs_p[:n] = objs
    scene_p = np.zeros((max_nodes,), np.int32)
    scene_p[:n] = np.asarray(dec["obj_to_scene"], np.int32)
    tf = np.asarray(dec["text_feats"], np.float32)
    rf = np.asarray(dec["rel_feats"], np.float32)
    tf_p = np.zeros((max_nodes, tf.shape[1] if tf.ndim == 2 else 512), np.float32)
    rf_p = np.zeros((max_edges, rf.shape[1] if rf.ndim == 2 else 512), np.float32)
    if n:
        tf_p[:n] = tf
    if e:
        rf_p[:e] = rf
    trip_p = np.zeros((max_edges, 3), np.int32)
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


# nuScenes layout scenes carry ≤13 objects + the ego node
# (``prepare_nusc_layout_dataset.py:22-66``; layout_length=13 in the 2D
# configs); each object pair emits up to 5 relationships and each
# object–ego pair up to 4.
MAX_OBJECTS_PER_SCENE = 13
EDGES_PER_SCENE = (
    MAX_OBJECTS_PER_SCENE * (MAX_OBJECTS_PER_SCENE - 1) // 2 * 5
    + MAX_OBJECTS_PER_SCENE * 4
)  # 442


def _round8(n: int) -> int:
    return (n + 7) // 8 * 8


class LayoutTrainer(Trainer):
    """Scene-graph → 1D layout diffusion trainer (nuscenes-layout);
    cf. ``tools/train/train_layout.py:29-213``.  ``data_iter`` yields
    collated scene-graph batches (``collate_scene_graphs`` format).

    Node/edge budgets default to the dataset's worst case for
    ``batch_size_train`` scenes (not a guess); a batch that still overflows
    grows the budgets and recompiles instead of crashing mid-run."""

    def __init__(self, cfg, data_iter, max_nodes: int | None = None,
                 max_edges: int | None = None, **kw):
        B = cfg.training.batch_size_train
        self.max_nodes = max_nodes or _round8(B * (MAX_OBJECTS_PER_SCENE + 1))
        self.max_edges = max_edges or _round8(B * EDGES_PER_SCENE)
        super().__init__(cfg, data_iter, **kw)

    def _build(self, cfg, **kw):
        from .factory import build_layout_training

        return build_layout_training(
            cfg,
            num_objs=kw.get("num_objs", 9),
            num_preds=kw.get("num_preds", 16),
        )

    def _loss_kwargs(self):
        return {"num_scenes": self.cfg.training.batch_size_train}

    def init_state(self, rng):
        g = {
            "objs": jnp.zeros((self.max_nodes,), jnp.int32),
            "triples": jnp.zeros((self.max_edges, 3), jnp.int32),
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

    def prepare_batch(self, batch):
        if "scenegraph" in batch:
            return batch
        dec = batch["decoder"] if "decoder" in batch else batch
        n = len(np.asarray(dec["objs"]))
        e = len(np.asarray(dec.get("tripltes", dec.get("triples"))).reshape(-1, 3))
        if n > self.max_nodes or e > self.max_edges:
            # grow-and-recompile policy (documented): a bigger-than-expected
            # scene re-pads to new budgets; jit retraces once per new shape
            self.max_nodes = max(self.max_nodes, _round8(n))
            self.max_edges = max(self.max_edges, _round8(e))
            if self.log_fn is not None:
                self.log_fn({
                    "layout_budget_grow":
                        {"max_nodes": self.max_nodes, "max_edges": self.max_edges}
                })
        return pad_layout_batch(batch, self.max_nodes, self.max_edges)
