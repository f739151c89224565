"""AOT sampler export for serving (``jax.export`` → serialized StableHLO).

TPU-native serving path with no reference analogue: the reference deploys by
loading torch modules into a Python runtime (``tools/generate/generate.py``,
``sample_and_save_temporal.py``); here the ENTIRE sampler — the 50-step DDIM
``lax.scan``, conditioning encoder, and range→point postprocess — is traced,
lowered and serialized once.  A serving host then deserializes the artifact
and calls it with fresh RNG keys (and per-request conditions), with no model
code, config registry, or checkpoint restore on the request path.

Artifacts are self-contained directories::

    <dir>/sampler.stablehlo   # jax.export serialization (params baked in)
    <dir>/meta.json           # config name, shapes, steps, platforms, ...

Cross-platform notes: exports lower for the platforms requested (e.g.
``["tpu"]`` from a CPU host).  The Pallas kernel gates consult the *export
host's* backend, so artifacts built on a non-TPU host always use the pure
StableHLO (XLA) path — portable everywhere; artifacts built on a TPU host
for TPU embed the Mosaic kernels and keep their measured speedup.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..training.factory import build_diffusion_training
from ..training.preprocess import postprocess_sample

_ARTIFACT_NAME = "sampler.stablehlo"
_META_NAME = "meta.json"


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def build_sampler_fn(
    cfg,
    params,
    *,
    batch_size: int,
    num_steps: int,
    mode: str = "ddim",
    dtype: Any = jnp.bfloat16,
    with_postprocess: bool = True,
) -> tuple[Callable, bool]:
    """Build the serving-shaped sampler for an image-diffusion config.

    Returns ``(fn, conditional)``:

    - unconditional configs: ``fn(rng) -> out``
    - concat-conditioned configs: ``fn(rng, condition) -> out`` where
      ``condition`` is the engine's ``batch_dict`` (per-request input)

    ``out`` is ``postprocess_sample``'s dict (depth/xyz/reflectance) when
    ``with_postprocess`` else the raw [-1, 1] sample.  The model forward runs
    in ``dtype`` (bf16 default, as ``bench.py``); schedules, scan carry and
    postprocess stay f32.
    """
    model, engine, lidar_utils = build_diffusion_training(cfg)
    conditional = getattr(engine, "cond_apply_fn", None) is not None

    if dtype is not None:
        params = _cast_tree(params, dtype)
        if conditional:
            den = model["model"]
            engine = dataclasses.replace(
                engine,
                apply_fn=lambda p, x, cd: den.apply(
                    p["model"], x.astype(dtype), _cast_tree(cd, dtype)
                ).astype(jnp.float32),
            )
        else:
            engine = dataclasses.replace(
                engine,
                apply_fn=lambda p, x, t: model.apply(
                    p, x.astype(dtype), t.astype(dtype)
                ).astype(jnp.float32),
            )

    def _finish(sample):
        if with_postprocess:
            return postprocess_sample(sample, lidar_utils)
        return sample

    if conditional:

        def fn(rng, condition):
            s = engine.sample(
                params, rng, condition,
                batch_size=batch_size, num_steps=num_steps, mode=mode,
            )
            return _finish(s)

    else:

        def fn(rng):
            s = engine.sample(
                params, rng, batch_size=batch_size, num_steps=num_steps,
                mode=mode,
            )
            return _finish(s)

    return fn, conditional


def export_sampler(
    cfg,
    params,
    *,
    batch_size: int,
    num_steps: int,
    mode: str = "ddim",
    dtype: Any = jnp.bfloat16,
    with_postprocess: bool = True,
    condition_example: Any = None,
    platforms: tuple[str, ...] | None = None,
) -> jax_export.Exported:
    """Trace + lower the sampler and return the ``jax.export.Exported``.

    ``platforms`` defaults to the current backend; pass ``("tpu",)`` (or
    several) to cross-lower from a different host.  Conditional configs
    require ``condition_example`` — a pytree with the per-request shapes;
    its *values* are not baked in, only shapes/dtypes.
    """
    fn, conditional = build_sampler_fn(
        cfg, params, batch_size=batch_size, num_steps=num_steps, mode=mode,
        dtype=dtype, with_postprocess=with_postprocess,
    )
    rng = jax.random.PRNGKey(0)
    exp = jax_export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )
    if conditional:
        if condition_example is None:
            raise ValueError(
                "conditional config: pass condition_example with the "
                "per-request condition shapes"
            )
        return exp(rng, condition_example)
    return exp(rng)


def save_artifact(
    out_dir: str | pathlib.Path,
    exported: jax_export.Exported,
    meta: dict | None = None,
) -> pathlib.Path:
    """Serialize an export + metadata into an artifact directory."""
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / _ARTIFACT_NAME).write_bytes(exported.serialize())
    info = {
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "jax_version": jax.__version__,
        **(meta or {}),
    }
    (out / _META_NAME).write_text(json.dumps(info, indent=2))
    return out


def load_artifact(
    art_dir: str | pathlib.Path,
) -> tuple[Callable, dict]:
    """Deserialize an artifact directory → ``(callable, meta)``.

    The callable has the exported signature (``fn(rng)`` or
    ``fn(rng, condition)``) and runs on the current backend, which must be
    one of ``meta['platforms']``.
    """
    art = pathlib.Path(art_dir)
    exported = jax_export.deserialize((art / _ARTIFACT_NAME).read_bytes())
    meta = json.loads((art / _META_NAME).read_text())
    return exported.call, meta
