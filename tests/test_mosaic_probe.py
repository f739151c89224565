"""Mosaic availability probe: the Pallas gates must degrade to XLA when the
backend can't compile Mosaic programs (ops/mosaic.py)."""

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.ops import mosaic
from lidarcrafter_tpu.ops.pallas_groupnorm import use_fused_groupnorm


def setup_function(_):
    mosaic._reset_probe_cache()


def teardown_function(_):
    mosaic._reset_probe_cache()


def test_probe_kill_switch(monkeypatch):
    monkeypatch.setenv("LCT_PALLAS", "0")
    assert not mosaic.mosaic_available()


def test_probe_trust_mode(monkeypatch):
    monkeypatch.setenv("LCT_MOSAIC_PROBE", "0")
    assert mosaic.mosaic_available()


def test_probe_failure_is_cached_and_never_raises(monkeypatch):
    calls = []

    def boom():
        calls.append(1)
        raise RuntimeError("no mosaic here")

    monkeypatch.setattr(mosaic, "_run_probe", boom)
    assert not mosaic.mosaic_available()
    assert not mosaic.mosaic_available()
    assert len(calls) == 1  # verdict cached after the first attempt


def test_probe_inside_jit_trace_not_poisoned(monkeypatch):
    """Regression: the first gate consultation normally happens at TRACE
    time (from a flax module under the sampler's jit).  The probe must
    escape the ambient trace — before the ``ensure_compile_time_eval``
    guard, omnistaging turned the probe's arrays into tracers, ``bool()``
    raised TracerBoolConversionError, and the swallowed exception cached
    ``False``: every Pallas kernel silently fell back to XLA for the whole
    process (measured -29% layout-cond sampling throughput)."""
    import functools

    monkeypatch.setattr(
        mosaic, "_run_probe", functools.partial(mosaic._run_probe, interpret=True)
    )
    seen = []

    @jax.jit
    def f(x):
        seen.append(mosaic.mosaic_available())
        return x * 2

    f(jnp.ones((2,)))
    assert seen == [True]
    assert mosaic._PROBE_RESULT is True


def test_gate_defers_to_probe(monkeypatch):
    """A TPU-looking backend whose probe fails must keep the XLA path."""
    monkeypatch.setenv("LCT_FUSED_GN", "1")  # GN kernel is opt-in
    monkeypatch.setattr(mosaic, "_run_probe", lambda: False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    x = jnp.zeros((2, 4, 128, 128), jnp.bfloat16)
    assert not use_fused_groupnorm(x, 32)
    monkeypatch.setattr(mosaic, "_run_probe", lambda: True)
    mosaic._reset_probe_cache()
    assert use_fused_groupnorm(x, 32)
