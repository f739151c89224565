"""Multi-host utilities (eval-result merge, distributed init).

The reference merges cross-rank eval results through shared-tmpdir pickles
(``lidargen/utils/common_utils.py:229-252``, NCCL barriers); the TPU-native
equivalent is ``jax.experimental.multihost_utils`` allgathers over ICI/DCN.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax


def initialize_distributed(**kwargs) -> None:
    """cf. ``common_utils.init_dist_pytorch/init_dist_slurm`` (:162-207):
    on TPU pods this is ``jax.distributed.initialize`` (env-driven).

    With explicit kwargs we must NOT touch ``jax.process_count()`` first —
    it would initialise the XLA backend and make the cluster init illegal."""
    if not kwargs and jax.process_count() == 1:
        return  # single host; nothing to do
    jax.distributed.initialize(**kwargs)


def merge_results_dist(local_results: Any) -> list:
    """Gather per-host result lists to every host; cf.
    ``common_utils.merge_results_dist`` (:229-252).

    ``local_results``: list of numpy-compatible records (equal count per host
    after padding — the caller pads like the reference pads its tmpdir parts).
    """
    if jax.process_count() == 1:
        return list(local_results)
    from jax.experimental import multihost_utils

    stacked = np.stack([np.asarray(r) for r in local_results])
    gathered = multihost_utils.process_allgather(stacked)
    return [g for part in gathered for g in part]


def is_main_process() -> bool:
    return jax.process_index() == 0
