"""Test config: force an 8-device virtual CPU mesh before JAX backend init.

This is the JAX-native replacement for multi-node test harnesses (SURVEY.md §4):
sharding/pjit tests run against 8 virtual CPU devices.

Note: the environment's sitecustomize pins ``jax_platforms=axon,cpu`` (a real
TPU tunnel); we override to cpu-only here so tests are hermetic and
deterministic.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the CLI-subprocess smokes and the big parity
# models cost minutes of XLA:CPU compile cold, seconds warm
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
