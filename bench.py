"""Benchmark: generated 32×1024 frames/sec/chip at 50 DDIM steps (flagship model).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline: the driver's north-star target of 10 frames/s/chip on TPU v5e
(BASELINE.json; the reference publishes no numbers, BASELINE.md).
"""

import json
import os
import sys
import time

import jax

# Persistent compilation cache: first driver run pays the ~2-7 min compile,
# subsequent runs reuse the serialized executable.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training import build_diffusion_training

    cfg = get_config("nuscenes-unet-uncond")
    model, engine, _ = _build(cfg)

    H, W = cfg.data.resolution
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    num_steps = int(os.environ.get("BENCH_STEPS", "50"))

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, H, W, 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((batch,)))

    def sample(params, rng):
        out = engine.sample(
            params, rng, batch_size=batch, num_steps=num_steps, mode="ddim"
        )
        # Host fetch of a scalar: robust completion barrier (block_until_ready
        # can return early through remote-device tunnels).
        return float(jnp.sum(out[..., 0:1, 0]))

    # warmup / compile
    sample(params, rng)

    reps = int(os.environ.get("BENCH_REPS", "3"))
    t0 = time.perf_counter()
    for i in range(reps):
        sample(params, jax.random.fold_in(rng, i))
    dt = time.perf_counter() - t0

    frames_per_sec = reps * batch / dt
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


def _build(cfg):
    from lidarcrafter_tpu.training import build_diffusion_training

    model, engine, lidar_utils = build_diffusion_training(cfg)
    return model, engine, lidar_utils


if __name__ == "__main__":
    sys.exit(main())
