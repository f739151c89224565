"""Checkpoint save/restore (orbax) mirroring the reference's ckpt contract.

The reference saves ``{cfg, weights, ema_weights, optimizer, lr_scheduler,
global_step}`` (``train_lidm.py:249-259``) and rehydrates configs from the
checkpoint (``inference.py:36-38``).  Here the same logical contents live in
an orbax checkpoint: the train state pytree plus the config as a JSON-able
dict.  Async-capable saves replace the reference's blocking ``torch.save``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def config_to_dict(cfg) -> dict:
    def conv(o):
        if dataclasses.is_dataclass(o):
            return {k: conv(v) for k, v in dataclasses.asdict(o).items()}
        if isinstance(o, (tuple, list)):
            return [conv(v) for v in o]
        if isinstance(o, dict):
            return {k: conv(v) for k, v in o.items()}
        return o

    return conv(cfg)


def save_checkpoint(path: str, state: TrainState, cfg=None) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if cfg is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config_to_dict(cfg), f, indent=2, default=str)


def restore_checkpoint(path: str, template: TrainState) -> tuple[TrainState, dict | None]:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    state = ckptr.restore(os.path.join(path, "state"), abstract)
    cfg_path = os.path.join(path, "config.json")
    cfg = None
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
    return state, cfg
