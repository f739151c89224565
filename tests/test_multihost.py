"""Real multi-process distributed test: 2 JAX processes × 4 virtual CPU
devices form one 8-device cluster; exercises ``parallel/multihost.py``
(distributed init + cross-host eval-result merge, cf. the reference's NCCL
``merge_results_dist``, ``common_utils.py:229-252``) and a dp-sharded global
computation over the combined mesh.

This is the multi-HOST complement to the virtual-device mesh tests in
``test_training.py`` (which run 8 devices in ONE process).
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

_WORKER = r"""
import json, os, sys

import jax

jax.config.update("jax_platforms", "cpu")
coordinator, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

sys.path.insert(0, {repo!r})
from lidarcrafter_tpu.parallel.multihost import (
    initialize_distributed, is_main_process, merge_results_dist,
)

initialize_distributed(
    coordinator_address=coordinator, num_processes=2, process_id=pid
)
assert jax.process_count() == 2
assert jax.device_count() == 8 and len(jax.local_devices()) == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# dp-sharded global computation over the 2-host mesh
mesh = Mesh(np.array(jax.devices()).reshape(8), ("dp",))
sharding = NamedSharding(mesh, P("dp"))
local = jnp.arange(4, dtype=jnp.float32) + 4 * pid  # this host's shard rows
garr = jax.make_array_from_single_device_arrays(
    (8,), sharding,
    [jax.device_put(local[i : i + 1], d) for i, d in enumerate(jax.local_devices())],
)
# replicated-output jit: every process holds the SPMD-computed global sum
sum_fn = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))
total = float(sum_fn(garr))

# cross-host eval-result merge (each host contributes 3 records)
records = [np.full((2,), 10 * pid + i, np.float32) for i in range(3)]
merged = merge_results_dist(records)

result = {
    "pid": pid,
    "total": total,
    "merged": sorted(float(m[0]) for m in merged),
    "is_main": is_main_process(),
}
with open(out_path, "w") as f:
    json.dump(result, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_merge(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.replace("{repo!r}", repr(str(REPO))))
    coordinator = f"127.0.0.1:{_free_port()}"

    procs = []
    for pid in range(2):
        env = dict(
            __import__("os").environ,
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_PLATFORMS="",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), coordinator, str(pid),
                 str(tmp_path / f"out_{pid}.json")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    outs = [p.communicate(timeout=280) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    results = [json.loads((tmp_path / f"out_{i}.json").read_text()) for i in range(2)]
    for r in results:
        # global dp sum over both hosts' shards: sum(range(8)) = 28
        assert r["total"] == 28.0
        # merge sees all 6 records from both hosts
        assert r["merged"] == [0.0, 1.0, 2.0, 10.0, 11.0, 12.0]
    assert results[0]["is_main"] and not results[1]["is_main"]
