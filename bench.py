"""Benchmark: generated 32×1024 frames/sec/chip at 50 DDIM steps (flagship model).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline: the driver's north-star target of 10 frames/s/chip on TPU v5e
(BASELINE.json; the reference publishes no numbers, BASELINE.md).

Inference precision defaults to bf16 (deployment-standard for diffusion
sampling; parity tests run fp32).  Override with BENCH_DTYPE=float32.
"""

import dataclasses
import json
import os
import sys
import time

import jax

# Persistent compilation cache: first driver run pays the compile,
# subsequent runs reuse the serialized executable.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training import build_diffusion_training

    cfg = get_config("nuscenes-unet-uncond")
    model, engine, _ = build_diffusion_training(cfg)

    H, W = cfg.data.resolution
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    num_steps = int(os.environ.get("BENCH_STEPS", "50"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, H, W, 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((batch,)))
    if dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        engine = dataclasses.replace(
            engine,
            apply_fn=lambda p, xt, t: model.apply(
                p, xt.astype(dtype), t.astype(dtype)
            ).astype(jnp.float32),
        )

    def sample(rng):
        return engine.sample(
            params, rng, batch_size=batch, num_steps=num_steps, mode="ddim"
        )

    def fetch(outs):
        # Host fetch of scalars: robust completion barrier (block_until_ready
        # can return early through remote-device tunnels).
        return float(sum(jnp.sum(o[..., 0:1, 0]) for o in outs))

    fetch([sample(rng)])  # warmup / compile

    reps = int(os.environ.get("BENCH_REPS", "4"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))
    rates = []
    for r in range(rounds):
        t0 = time.perf_counter()
        outs = [sample(jax.random.fold_in(rng, r * reps + i)) for i in range(reps)]
        fetch(outs)
        dt = time.perf_counter() - t0
        rates.append(reps * batch / dt)
    rates.sort()
    frames_per_sec = rates[len(rates) // 2]  # median over rounds

    target = 10.0  # BASELINE.json north star, frames/s/chip @ 50 DDIM steps
    print(
        json.dumps(
            {
                "metric": "frames_per_sec_per_chip_50step_ddim_32x1024",
                "value": round(frames_per_sec, 3),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_sec / target, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
