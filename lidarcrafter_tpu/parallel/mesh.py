"""Device meshes and sharding rules.

The reference's distributed story is NCCL data-parallel via HF Accelerate
(``train_lidm.py:54-62,146-148``; ``common_utils.py:162-207``).  The TPU-native
equivalent is a ``jax.sharding.Mesh`` with named axes and ``pjit``-style
shardings; gradient all-reduce is implicit in the jitted computation and rides
ICI.

Axes:

- ``dp`` — data parallel: batch dimension sharded across chips.
- ``sp`` — azimuth (sequence/context) parallel: the periodic W axis of the
  32×1024 range image is sharded; XLA lowers the ring-pad wrap-around and conv
  halos to neighbor ``collective-permute``s over ICI, which is the idiomatic
  TPU analogue of the reference's circular padding on one GPU (SURVEY.md §2.8).

Model size (~40M params) needs no tensor/pipeline sharding for parity (the
reference has none, SURVEY.md §2.8); ``dp×sp`` is the scaling story.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    dp: int | None = None,
    sp: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (dp, sp) mesh over the first ``n_devices`` devices.

    ``dp`` defaults to ``n_devices // sp``.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    if dp is None:
        assert n % sp == 0, (n, sp)
        dp = n // sp
    assert dp * sp == n, (dp, sp, n)
    dev_array = np.asarray(devices).reshape(dp, sp)
    return Mesh(dev_array, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh, ndim: int, sp_axis: int | None = None) -> NamedSharding:
    """Shard dim 0 over ``dp`` and optionally ``sp_axis`` over ``sp``.

    For NHWC range images ``sp_axis=2`` shards the azimuth (W) axis.
    """
    spec = [None] * ndim
    spec[0] = "dp"
    if sp_axis is not None:
        spec[sp_axis] = "sp"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
