"""One-time Mosaic availability probe shared by the Pallas kernel gates.

The fused attention / GroupNorm kernels are routing *optimizations*: every
call site has an XLA fallback with identical semantics.  A TPU backend that
cannot compile Mosaic programs (old jaxlib, restricted runtime, a tunnel
hiccup) must therefore degrade to the XLA path instead of sinking the whole
jitted graph.  ``mosaic_available()`` compiles one trivial kernel the first
time a gate consults it (~1 s warm via the persistent compile cache; ~90 s
cold through the axon tunnel) and caches the verdict for the process.

Set ``LCT_MOSAIC_PROBE=0`` to skip the probe and trust the backend (the
kernels are then gated only by backend/shape checks), or ``LCT_PALLAS=0``
to refuse Mosaic routing outright.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_PROBE_RESULT: bool | None = None


def _run_probe(interpret: bool = False) -> bool:
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    # The gate is normally consulted at TRACE time (from a flax module under
    # the caller's jit).  Under omnistaging every op here would bind to the
    # ambient trace — ``bool()`` on the result then raises
    # TracerBoolConversionError, the except in ``mosaic_available`` swallows
    # it, and Pallas routing is silently poisoned OFF for the whole process.
    # ``ensure_compile_time_eval`` escapes the trace so the probe compiles
    # and runs eagerly exactly once.
    with jax.ensure_compile_time_eval():
        x = jnp.ones((8, 128), jnp.float32)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interpret,
        )(x)
        return bool(jax.device_get(out[0, 0]) == 2.0)


def mosaic_available() -> bool:
    """Can this process compile and run a Mosaic kernel on the default
    backend?  Cached after the first call; never raises."""
    global _PROBE_RESULT
    if os.environ.get("LCT_PALLAS", "1") == "0":
        return False
    if _PROBE_RESULT is None:
        if os.environ.get("LCT_MOSAIC_PROBE", "1") == "0":
            _PROBE_RESULT = True
        else:
            try:
                _PROBE_RESULT = _run_probe()
            except Exception:
                _PROBE_RESULT = False
    return _PROBE_RESULT


def _reset_probe_cache() -> None:
    """Test hook."""
    global _PROBE_RESULT
    _PROBE_RESULT = None
