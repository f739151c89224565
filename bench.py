"""Benchmark: generated 32×1024 frames/sec/chip at 50 DDIM steps (flagship model).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
"extra": {...}}.  Baseline: the driver's north-star target of 10 frames/s/chip
on TPU v5e (BASELINE.json; the reference publishes no numbers, BASELINE.md).

The headline metric is unconditional single-frame sampling.  ``extra`` covers
the flagship 4D pipeline (VERDICT r1 §6): layout-conditioned sampling f/s,
autoregressive sampling f/s, and the full 1+15-frame rollout wall-clock
(``sample_and_save_temporal.py:284``).  Disable with BENCH_FULL=0.

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
import numpy as np

DTYPE_NAME = os.environ.get("BENCH_DTYPE", "bfloat16")
DTYPE = jnp.bfloat16 if DTYPE_NAME == "bfloat16" else jnp.float32
NUM_STEPS = int(os.environ.get("BENCH_STEPS", "50"))


def _progress(msg):
    # stderr progress markers: the stdout contract is ONE JSON line, but a
    # cold run through the TPU tunnel can spend minutes per sub-bench and an
    # observer (or a timeout post-mortem) needs to see how far it got.
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _zeros_init(init_fn, *args):
    """Abstract init → zero-leaf params.  The throughput benches run
    random-weight models, so zero weights time identically — and eval_shape
    skips the eager init compile, which costs minutes through the TPU
    tunnel per model."""
    shapes = jax.eval_shape(init_fn, *args)
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def _fetch(outs):
    # Host fetch of scalars: robust completion barrier (block_until_ready
    # can return early through remote-device tunnels).
    return float(sum(jnp.sum(o[..., 0:1, 0]) for o in outs))


def _median_rate(sample_fn, rng, batch, reps, rounds):
    _fetch([sample_fn(rng)])  # warmup / compile
    rates = []
    for r in range(rounds):
        t0 = time.perf_counter()
        outs = [sample_fn(jax.random.fold_in(rng, r * reps + i)) for i in range(reps)]
        _fetch(outs)
        dt = time.perf_counter() - t0
        rates.append(reps * batch / dt)
    rates.sort()
    return rates[len(rates) // 2]


V5E_PEAK_BF16_FLOPS = 197e12  # TPU v5e MXU peak (bf16)
V5E_HBM_BYTES_PER_S = 819e9


def _cost_stats(sample_fn, rng, wall_per_call, roofs=None):
    """Compiled-program cost analysis → bytes/step + utilization (VERDICT r2
    weak #10: report arithmetic intensity so HBM regressions are visible).

    XLA's ``cost_analysis`` counts a ``while`` body ONCE (not × trip count),
    so for a sampler whose cost is ~all inside the 50-step scan the reported
    flops/bytes ARE per-step figures; utilization therefore compares them to
    per-step wall (wall_per_call / NUM_STEPS).  Round-2's report divided by
    NUM_STEPS twice and showed 0.75% MFU for a sampler actually near roof.

    Accuracy (validated round 4 against known-traffic kernels on-chip):
    ``flops`` is accurate; ``bytes accessed`` is exact for elementwise
    fusions but OVERCOUNTS reduces (~3x), GN chains (~2x) and convs (~5x on
    small shapes) — it sums per-instruction operand bytes inside fusions.
    The device trace's raw_bytes_accessed for this sampler is 12.6 GB/step
    vs cost_analysis' 17.7 (BASELINE.md round-4 reconciliation).  Treat
    ``hbm_util_pct`` as an UPPER BOUND on real HBM pressure.

    ``roofs``: same-run ``chip_microbench()`` output; utilization is
    computed against those measured roofs (the honest denominators —
    ~645 GB/s / ~186 TF/s on this tunnel chip), falling back to datasheet.
    """
    try:
        ca = jax.jit(sample_fn).lower(rng).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        out = {
            "gbytes_per_step": round(byts / 1e9, 2),
            "gflops_per_step": round(flops / 1e9, 1),
        }
        peak_flops = V5E_PEAK_BF16_FLOPS
        peak_hbm = V5E_HBM_BYTES_PER_S
        if roofs:
            peak_flops = roofs["matmul_tf_bf16"] * 1e12
            peak_hbm = roofs["hbm_gbps_stream"] * 1e9
            out["roofs"] = "measured"
        if wall_per_call > 0:
            wall_per_step = wall_per_call / NUM_STEPS
            out["mfu_pct"] = round(100.0 * flops / wall_per_step / peak_flops, 2)
            out["hbm_util_upper_bound_pct"] = round(
                100.0 * byts / wall_per_step / peak_hbm, 1
            )
        return out
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"}


def chip_microbench(lo=4, hi=64):
    """Measured compute/bandwidth roofs of THIS chip via slope fitting.

    Round-3's microbench timed a fixed rep count end-to-end and reported
    ~318 GB/s / ~62-126 TF/s — numbers that could not coexist with the
    sampler's ~80% datasheet HBM utilization (VERDICT r3 weak #2).  The
    culprit was a ~25-30 ms FIXED host-fetch round-trip through the axon
    tunnel inside every timed region.  Timing two rep counts and fitting the
    slope cancels that constant exactly: per-pass time = (t_hi − t_lo) /
    (hi − lo).  Measured this way the chip is near datasheet:
    ~645 GB/s stream (79%) and ~186 TF/s bf16 matmul (94%).
    """
    import jax.random as jr

    n = 8192
    a = jr.normal(jr.PRNGKey(0), (n, n), jnp.bfloat16)
    b = jr.normal(jr.PRNGKey(1), (n, n), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    _fetch([mm(a, b)])  # compile + warm

    def time_mm(reps):
        t0 = time.perf_counter()
        out = a
        for _ in range(reps):
            out = mm(out, b)  # chained on data so the passes serialize
        _fetch([out])
        return time.perf_counter() - t0

    # best-of-3 on each DURATION separately: a roof is the best achievable
    # rate and tunnel hiccups only ever ADD time to a single duration — but
    # a hiccup inside a LO timing would shrink the difference, so taking
    # min over (t_hi - t_lo) pairs could select a contaminated slope (one
    # round-5 single-shot read 178 GB/s vs ~645 steady-state)
    t_lo = min(time_mm(lo) for _ in range(3))
    t_hi = min(time_mm(hi) for _ in range(3))
    slope = (t_hi - t_lo) / (hi - lo)
    matmul_tf = 2 * n**3 / slope / 1e12

    x = jr.normal(jr.PRNGKey(2), (1024 * 1024 * 1024 // 4,), jnp.float32)  # 1 GB
    stream = jax.jit(lambda x: x * 1.0001 + 0.5)
    _fetch([stream(x)[None, None]])

    def time_stream(reps):
        t0 = time.perf_counter()
        out = x
        for _ in range(reps):
            out = stream(out)
        _fetch([out[None, None]])
        return time.perf_counter() - t0

    t_lo = min(time_stream(lo) for _ in range(3))
    t_hi = min(time_stream(hi) for _ in range(3))
    slope = (t_hi - t_lo) / (hi - lo)
    hbm_gbps = 2 * x.nbytes / slope / 1e9  # read + write per pass
    return {
        "matmul_tf_bf16": round(matmul_tf, 1),
        "hbm_gbps_stream": round(hbm_gbps, 1),
        "pct_of_v5e_datasheet": {
            "matmul": round(100 * matmul_tf * 1e12 / V5E_PEAK_BF16_FLOPS, 1),
            "hbm": round(100 * hbm_gbps * 1e9 / V5E_HBM_BYTES_PER_S, 1),
        },
    }


def bench_uncond(roofs=None):
    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training import build_diffusion_training

    cfg = get_config("nuscenes-unet-uncond")
    model, engine, _ = build_diffusion_training(cfg)

    H, W = cfg.data.resolution
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, H, W, 2), jnp.float32)
    params = _zeros_init(model.init, jax.random.PRNGKey(0), x, jnp.zeros((batch,)))
    if DTYPE == jnp.bfloat16:
        params = jax.tree_util.tree_map(lambda a: a.astype(DTYPE), params)
        engine = dataclasses.replace(
            engine,
            apply_fn=lambda p, xt, t: model.apply(
                p, xt.astype(DTYPE), t.astype(DTYPE)
            ).astype(jnp.float32),
        )

    def sample(rng):
        return engine.sample(
            params, rng, batch_size=batch, num_steps=NUM_STEPS, mode="ddim"
        )

    reps = int(os.environ.get("BENCH_REPS", "4"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))
    rate = _median_rate(sample, rng, batch, reps, rounds)
    return rate, _cost_stats(sample, rng, batch / rate, roofs)


def bench_train_step():
    """Flagship uncond training throughput (bf16-AMP fwd/bwd, f32 master
    params/optimizer — cf. the reference's fp16 Accelerate training,
    ``train_lidm.py:214-266``).  Returns (steps/s, frames/s)."""
    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training import build_diffusion_training
    from lidarcrafter_tpu.training.optim import make_optimizer
    from lidarcrafter_tpu.training.state import TrainState
    from lidarcrafter_tpu.training.train_step import make_train_step

    cfg = get_config("nuscenes-unet-uncond")
    model, engine, _ = build_diffusion_training(cfg)
    H, W = cfg.data.resolution
    B = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
    x = jnp.zeros((B, H, W, 2), jnp.float32)
    params = _zeros_init(model.init, jax.random.PRNGKey(0), x, jnp.zeros((B,)))
    tx = make_optimizer(
        lr=cfg.training.lr,
        warmup_steps=cfg.training.lr_warmup_steps,
        num_steps=cfg.training.num_steps,
    )
    state = TrainState.create(params, tx)
    step = make_train_step(engine, tx, amp=DTYPE == jnp.bfloat16)
    rng = jax.random.PRNGKey(7)
    x0 = jax.random.normal(jax.random.PRNGKey(8), (B, H, W, 2), jnp.float32)
    state, loss = step(state, x0, rng)  # compile + warmup
    _fetch([loss[None, None]])
    n = int(os.environ.get("BENCH_TRAIN_STEPS", "10"))
    t0 = time.perf_counter()
    for _ in range(n):
        # the state dependency chains the dispatches; one final fetch syncs
        state, loss = step(state, x0, rng)
    _fetch([loss[None, None]])
    dt = time.perf_counter() - t0
    return n / dt, n * B / dt


_COND_STACK_CACHE: dict = {}


def _build_cond_stack(name, B=None):
    """Production conditional stack (layout encoder + LayoutUnetV1) with
    random-initialized weights at the config's real topology.

    Memoized on (name, B): the bench's DDIM/DPM++ variants and the rollout
    share one stack instead of paying config build + two device inits per
    sub-bench (a first-order cost on this tunnel chip).  Safe because the
    init is deterministic (zeros) and callers never mutate the returns."""
    if B is None:
        B = int(os.environ.get("BENCH_COND_BATCH", "8"))
    key = (name, B)
    if key in _COND_STACK_CACHE:
        return _COND_STACK_CACHE[key]

    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training import (
        build_diffusion_training,
        layout_condition_batch,
    )

    cfg = get_config(name)
    models, engine, lidar_utils = build_diffusion_training(cfg)
    model, cond_model = models["model"], models["cond"]
    H, W = cfg.data.resolution

    # BASELINE.md tiling finding: B must be a multiple of 8 for full MXU
    # utilization; B=8 is the deployment batch, B=1 the rollout's legacy shape.
    batch = layout_condition_batch(cfg, B)
    cond_params = _zeros_init(cond_model.init, jax.random.PRNGKey(1), batch)
    layout = jax.eval_shape(cond_model.apply, cond_params, batch)
    cd = {
        "time_condition": jnp.zeros((B,)),
        "other_condition": jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), layout
        ),
    }
    model_params = _zeros_init(
        model.init, jax.random.PRNGKey(2), jnp.zeros((B, H, W, 2)), cd
    )
    params = {"model": model_params, "cond": cond_params}
    if DTYPE == jnp.bfloat16:
        params = jax.tree_util.tree_map(lambda a: a.astype(DTYPE), params)

        def apply_fn(p, x, c):
            c = jax.tree_util.tree_map(lambda a: a.astype(DTYPE), c)
            return model.apply(p["model"], x.astype(DTYPE), c).astype(jnp.float32)

        engine = dataclasses.replace(engine, apply_fn=apply_fn)
    out = (cfg, engine, params, batch, B, lidar_utils)
    _COND_STACK_CACHE[key] = out
    return out


def bench_layout_cond(name="nuscenes-auto-reg-v2", B=None, with_cost=False,
                      roofs=None, mode="ddim", num_steps=None):
    """Layout-conditioned (flagship conditional) sampling f/s."""
    _, engine, params, batch, B, _ = _build_cond_stack(name, B=B)
    rng = jax.random.PRNGKey(3)
    num_steps = NUM_STEPS if num_steps is None else num_steps

    def sample(rng):
        return engine.sample(
            params, rng, batch, batch_size=B, num_steps=num_steps, mode=mode
        )

    rate = _median_rate(sample, rng, B, reps=2, rounds=2)
    if with_cost:
        return rate, _cost_stats(sample, rng, B / rate, roofs)
    return rate


def bench_layout_cond_split_ab(B=8, halves=2, num_steps=None, mode="ddim"):
    """Counter-experiment for the 'structural DMA/compute overlap' claim
    (VERDICT r4 task 5): run the SAME 50-step conditional sampler with the
    denoiser call split into ``halves`` independent sub-batches inside every
    step.  Two independent half-batch UNet graphs give XLA's scheduler
    maximal freedom to overlap one half's DMA with the other half's compute
    across fusion boundaries.  If the 26% gap to the perfect-overlap ceiling
    were recoverable by scheduling, this variant would run faster than the
    monolithic B=8 program; if it measures the same or slower, the gap is
    structural to the fusion shapes, as BASELINE.md claims.
    """
    assert B % halves == 0, (B, halves)
    _, engine, params, batch, B, _ = _build_cond_stack("nuscenes-auto-reg-v2", B=B)
    num_steps = NUM_STEPS if num_steps is None else num_steps
    h = B // halves
    base_apply = engine.apply_fn

    def split_apply(p, x, c):
        outs = []
        for i in range(halves):
            ci = jax.tree_util.tree_map(
                lambda a: a[i * h:(i + 1) * h]
                if hasattr(a, "shape") and a.ndim >= 1 and a.shape[0] == B
                else a,
                c,
            )
            outs.append(base_apply(p, x[i * h:(i + 1) * h], ci))
        return jnp.concatenate(outs, axis=0)

    eng = dataclasses.replace(engine, apply_fn=split_apply)

    def sample(rng):
        return eng.sample(
            params, rng, batch, batch_size=B, num_steps=num_steps, mode=mode
        )

    return _median_rate(sample, jax.random.PRNGKey(3), B, reps=2, rounds=2)


def _cert_synthetic_x0(key, B, H, W):
    """Structured, learnable range-image distribution for the cert's brief
    training phase (shared with tests/test_solver_quality_e2e.py)."""
    from lidarcrafter_tpu.utils.synthetic import banded_range_image_batch

    return banded_range_image_batch(key, B, H, W)


def bench_solver_cert(num_ref_steps=1024, B=2,
                      train_steps=int(os.environ.get("BENCH_CERT_TRAIN", "400"))):
    """Solver-accuracy certification ON THE PRODUCTION STACK (VERDICT r4
    task 2): the ``nuscenes-auto-reg-v2`` topology at the full 32×1024
    resolution, real layout conditioning, eps-pred + clipped x̂_0 — the
    flagship sampler's exact configuration.  Measures the
    probability-flow-ODE solver error of DDIM@50 / DPM++(2M)@25 /
    DPM++(2M)@20 against a ``num_ref_steps``-step DDIM fine-grid solution of
    the SAME conditioned ODE, in f32 (bf16 rounding would pollute the
    solver-error signal).

    ``train_steps`` > 0 first trains the stack briefly on a synthetic
    structured distribution (~1 min on-chip): a RANDOM-weight production
    net is a measurably stiffer ODE than a trained one (its x̂_0 has
    arbitrary fine-scale t-dependence that defeats the 2M extrapolation —
    measured ratio_ddim50_over_dpmpp25 = 0.58 at init on the uniform-t
    grid), while the deployment ODE is a trained, smooth field.  The bench
    records the trained-ODE figures as the deployment-relevant ones.

    Round-5 finding this cert produced: on the TRAINED production ODE the
    uniform-t grid's dpmpp@25 is 1.66x WORSE than ddim@50 (3.97e-2 vs
    2.40e-2) — the round-4 TinyUNet-only certification did not transfer —
    while the uniform-λ grid (now the engine default) measures 7.3e-3 @25
    and 1.22e-2 @20, i.e. 3.3x / 2.0x BELOW ddim@50.  The t-grid number is
    retained in the output as counter-evidence.

    The TinyUNet harness (tests/test_dpmpp.py:141) certifies the solver on
    *a* network ODE; this reports the error ratios on the production ODE —
    the stiffness the @25/@20 product paths actually face.  Cf. the
    reference's own step-count conservatism
    (``sample_and_save_temporal.py:359``: 256 DDPM steps for eval).
    """
    from lidarcrafter_tpu.configs import get_config
    from lidarcrafter_tpu.training import (
        TrainState,
        build_diffusion_training,
        layout_condition_batch,
        make_optimizer,
        make_train_step,
    )
    from __graft_entry__ import _host_init

    cfg = get_config("nuscenes-auto-reg-v2")
    models, engine, _ = build_diffusion_training(cfg)
    model, cond_model = models["model"], models["cond"]
    H, W = cfg.data.resolution

    batch = layout_condition_batch(cfg, B, rng=jax.random.PRNGKey(21))
    cond_params = _host_init(cond_model.init, batch, seed=1)
    layout = jax.eval_shape(cond_model.apply, cond_params, batch)
    cd = {
        "time_condition": jnp.zeros((B,)),
        "other_condition": jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), layout
        ),
    }
    model_params = _host_init(
        model.init, jnp.zeros((B, H, W, 2)), cd, seed=2
    )
    params = {"model": model_params, "cond": cond_params}

    if train_steps > 0:
        _progress(f"solver cert: training production stack {train_steps} steps")
        tx = make_optimizer(lr=1e-4, warmup_steps=20, num_steps=train_steps)
        state = TrainState.create(params, tx)
        step_fn = make_train_step(engine, tx, donate=False)
        key = jax.random.PRNGKey(31)
        input_dict = dict(batch)
        for i in range(train_steps):
            key, kb, ks = jax.random.split(key, 3)
            input_dict["x_0"] = _cert_synthetic_x0(kb, B, H, W)
            state, loss = step_fn(state, input_dict, ks)
        _progress(f"solver cert: trained, final loss {float(loss):.4f}")
        params = state.params

    rng = jax.random.PRNGKey(23)

    def solve(n, mode, **kw):
        out = engine.sample(
            params, rng, batch, batch_size=B, num_steps=n, mode=mode, **kw
        )
        return np.asarray(out)

    _progress(f"solver cert: fine grid ddim@{num_ref_steps} (production stack, f32)")
    ref = solve(num_ref_steps, "ddim")
    errs = {}
    for label, n, mode, kw in (
        ("ddim50", 50, "ddim", {}),
        # product path: DPM++(2M) on the default uniform-λ grid
        ("dpmpp25", 25, "dpmpp_2m", {}),
        ("dpmpp20", 20, "dpmpp_2m", {}),
        ("dpmpp15", 15, "dpmpp_2m", {}),
        # the uniform-t grid is KEPT IN THE RECORD as the counter-evidence:
        # on this trained production ODE it is WORSE than ddim@50 (the
        # round-4 TinyUNet-only certification did not transfer; the λ grid
        # is what restores the product-path margin — see
        # diffusion/continuous.py::lambda_spaced_timesteps)
        ("dpmpp25_tgrid", 25, "dpmpp_2m", {"dpmpp_spacing": "t"}),
    ):
        errs[label] = float(np.abs(solve(n, mode, **kw) - ref).mean())
        _progress(f"solver cert: {label} err={errs[label]:.3e}")
    out = {f"err_{k}": round(v, 6) for k, v in errs.items()}
    out["ratio_ddim50_over_dpmpp25"] = round(errs["ddim50"] / errs["dpmpp25"], 2)
    out["ratio_ddim50_over_dpmpp20"] = round(errs["ddim50"] / errs["dpmpp20"], 2)
    out["ref_steps"] = num_ref_steps
    out["train_steps"] = train_steps
    return out


def bench_rollout(frames=int(os.environ.get("BENCH_FRAMES", "15")), scenes=1,
                  mode="ddim", num_steps=None):
    """Full 1+15-frame autoregressive rollout, on-device pipeline
    (cf. ``sample_and_save_temporal.py:203-335``), batched over ``scenes``.
    Frame 0 is the REAL ``nuscenes-box-layout-v6`` stack (the reference's
    frame-0 generator, ``sample_and_save_temporal.py:51-57``); frames 1..15
    the ``nuscenes-auto-reg-v2`` stack.  ``mode``/``num_steps`` select the
    sampler (product path: DPM++(2M) @ 25 — certified 50-DDIM-equivalent by
    tests/test_dpmpp.py).  Returns (wall seconds, frames/s)."""
    from lidarcrafter_tpu.pipeline import TemporalRollout

    S = scenes
    cfg0, engine0, params0, batch0, _, _ = _build_cond_stack(
        "nuscenes-box-layout-v6", B=S
    )
    cfg, engine, params, batch, _, lidar_utils = _build_cond_stack(
        "nuscenes-auto-reg-v2", B=S
    )
    # frame-0 batch: the layout-cond condition set (10ch concat_cond)
    sb = dict(batch0)
    pipeline = TemporalRollout(
        cond_engine=engine0, cond_params=params0,
        autoreg_engine=engine, autoreg_params=params,
        lidar_utils=lidar_utils,
        num_sampling_steps=NUM_STEPS if num_steps is None else num_steps,
        sampling_mode=mode,
    )
    K = 4
    r = np.random.RandomState(0)
    trajs = (r.rand(S, K + 1, 6, 2) * 0.5).astype(np.float32)
    boxes0 = np.concatenate(
        [r.rand(S, K, 2) * 30 - 15, r.rand(S, K, 1) * 2 - 1,
         1 + r.rand(S, K, 3) * 3, r.rand(S, K, 1) * 3],
        axis=2,
    ).astype(np.float32)
    classes = np.tile(np.arange(1, K + 1, dtype=np.float32), (S, 1))

    rng = jax.random.PRNGKey(4)
    # streaming delivery for the batched path: chunk the scan so most of the
    # frame transfer overlaps compute even within one blocking call (the
    # single-scene latency metric keeps one program — its fetch is ~0.14 s)
    chunks = 2 if S > 1 else 1
    # warmup with the SAME frame count: the scan trip count is baked into the
    # executable, so a 1-frame warmup would leave the timed run paying the
    # T-frame compile (or cache deserialize) through the TPU tunnel
    pipeline.rollout(
        sb, trajs, boxes0, classes, rng, num_frames=frames, stream_chunks=chunks
    )
    # median of 3: a single blocking rollout is one unrepeated sample and the
    # shared tunnel chip's session noise is ±10%
    walls = []
    for _ in range(3 if S > 1 else 1):
        t0 = time.perf_counter()
        out = pipeline.rollout(
            sb, trajs, boxes0, classes, rng, num_frames=frames, stream_chunks=chunks
        )
        walls.append(time.perf_counter() - t0)
    dt = float(np.median(walls))
    assert len(out) == frames + 1
    fps_single = (frames + 1) * S / dt

    # steady-state serving throughput: dispatch rollout k+1 BEFORE fetching
    # rollout k's frames, so the ~1.1 s device→host transfer of 16×S frames
    # (tunnel measures ~30 MB/s, round 5) overlaps the next rollout's compute
    # instead of serialising after it — standard double-buffering, the rate a
    # deployment actually sustains.  Single-call wall (incl. the fetch) stays
    # the reported latency number.
    iters = int(os.environ.get("BENCH_ROLLOUT_ITERS", "3"))
    t0 = time.perf_counter()
    prev = pipeline.rollout(
        sb, trajs, boxes0, classes, rng, num_frames=frames, fetch=False,
        stream_chunks=chunks,  # same programs as the warmup
    )
    for _ in range(iters - 1):
        cur = pipeline.rollout(
            sb, trajs, boxes0, classes, rng, num_frames=frames, fetch=False,
            stream_chunks=chunks,
        )
        for f in prev:
            np.asarray(f)
        prev = cur
    for f in prev:
        np.asarray(f)
    dt_pipe = (time.perf_counter() - t0) / iters
    return dt, (frames + 1) * S / dt_pipe, fps_single


def main():
    # measured roofs FIRST so every utilization figure below uses this run's
    # honest denominators (the tunnel chip's effective rate varies by session);
    # a calibration failure must never sink the headline (roofs=None falls
    # back to datasheet denominators in _cost_stats)
    roofs = None
    try:
        _progress("chip calibration (slope-fit roofs)")
        roofs = chip_microbench()
        _progress(
            f"roofs: {roofs['matmul_tf_bf16']} TF/s, {roofs['hbm_gbps_stream']} GB/s"
        )
    except Exception as e:
        _progress(f"chip calibration failed ({type(e).__name__}: {e})")
    _progress("uncond: building + compiling")
    frames_per_sec, cost = bench_uncond(roofs)
    _progress(f"uncond: {frames_per_sec:.2f} f/s")
    target = 10.0  # BASELINE.json north star, frames/s/chip @ 50 DDIM steps

    extra = {"uncond_cost": cost, "chip_calibration": roofs}
    if os.environ.get("BENCH_FULL", "1") != "0":
        # most-important-first with a wall budget: cold compiles through the
        # TPU tunnel can cost minutes each (the persistent cache makes later
        # runs cheap), so never let a cold sub-bench sink the whole report
        budget = float(os.environ.get("BENCH_BUDGET_S", "2700"))
        t_start = time.perf_counter()

        def within_budget():
            return time.perf_counter() - t_start < budget

        errors = {}

        def guard(name, fn, retries=1):
            """Run one sub-bench in isolation: a transient tunnel failure
            (remote_compile RPC resets happen — one aborted a whole round-5
            report tail) retries once, then is recorded in extra['errors']
            WITHOUT sinking the remaining sub-benches."""
            if not within_budget():
                return
            last = None
            for attempt in range(retries + 1):
                if attempt and not within_budget():
                    break  # a failed cold compile may have eaten the budget
                try:
                    fn()
                    return
                except Exception as e:
                    last = f"{type(e).__name__}: {e}"
                    _progress(f"{name} failed (attempt {attempt + 1}): {last[:160]}")
            errors[name] = last[:500]

        def layout_b8():
            _progress("layout-cond B=8: building + compiling")
            rate_b8, cond_cost = bench_layout_cond(B=8, with_cost=True, roofs=roofs)
            _progress(f"layout-cond B=8: {rate_b8:.2f} f/s")
            extra["layout_cond_fps_50step_ddim_b8"] = round(rate_b8, 3)
            extra["cond_cost"] = cond_cost

        # product fast path: DPM-Solver++(2M) on the λ grid — @25 certified
        # 3.3x below DDIM@50 solver error on the trained production stack,
        # @20 2.0x (aggressive), @15 parity (bench_solver_cert, BASELINE.md
        # round 5)
        def layout_dpm(n):
            def run():
                rate = bench_layout_cond(B=8, mode="dpmpp_2m", num_steps=n)
                _progress(f"layout-cond DPM++(2M) {n}-step: {rate:.2f} f/s")
                extra[f"layout_cond_fps_{n}step_dpmpp2m_b8"] = round(rate, 3)
            return run

        # canonical rollout keys stay SINGLE-CALL (one blocking rollout()
        # including its frame fetch), though round 5 changed methodology
        # within that meaning: median of 3 calls, streamed in 2 chunks
        # (extra.rollout_method records it — read cross-round diffs vs
        # BENCH_r01–r04 with that in mind); *_steady_state adds the serving
        # rate with the fetch overlapped into the next rollout's compute
        def roll(s8, mode="ddim", n=None, tag=""):
            def run():
                label = f"rollout x{s8}" + (f" DPM++(2M)@{n}" if tag else "")
                _progress(f"{label}: building + compiling")
                _, fpsp, fps = bench_rollout(scenes=s8, mode=mode, num_steps=n)
                _progress(f"{label}: {fps:.2f} f/s ({fpsp:.2f} steady-state)")
                key = f"rollout_scenes{s8}_{'fps_%dstep_dpmpp2m' % n if tag else 'frames_per_sec'}"
                extra[key] = round(fps, 2)
                skey = (f"rollout_scenes{s8}_fps_{n}step_steady_state" if tag
                        else f"rollout_scenes{s8}_fps_steady_state")
                extra[skey] = round(fpsp, 2)
            return run

        def split_ab():
            # opt-in reproduction of the round-5 structural-overlap
            # counter-experiment (BASELINE.md round 5)
            ab = bench_layout_cond_split_ab(B=16, halves=2)
            _progress(f"split 2x8 ddim@50 (B=16): {ab:.2f} f/s")
            extra["layout_cond_fps_50step_split2x8_b16"] = round(ab, 3)

        def layout_b1():
            extra["layout_cond_fps_50step_ddim_b1"] = round(bench_layout_cond(B=1), 3)
            _progress("layout-cond B=1 done")

        def single_scene(mode, n, key, label):
            def run():
                wall, _, _ = bench_rollout(scenes=1, mode=mode, num_steps=n)
                _progress(f"{label}: {wall:.1f} s")
                extra[key] = round(wall, 2)
            return run

        def train():
            steps_s, frames_s = bench_train_step()
            _progress(f"train step: {steps_s:.2f} steps/s")
            extra["train_steps_per_sec_b8_bf16amp"] = round(steps_s, 3)
            extra["train_frames_per_sec"] = round(frames_s, 2)

        def cert():
            # production-topology DPM++ certification (VERDICT r4 task 2)
            extra["solver_cert_production_stack"] = bench_solver_cert()

        guard("layout_b8", layout_b8)
        guard("layout_dpmpp25", layout_dpm(25))
        guard("layout_dpmpp20", layout_dpm(20))
        guard("layout_dpmpp15", layout_dpm(15))
        s8 = int(os.environ.get("BENCH_ROLLOUT_SCENES", "8"))
        if s8 > 1:
            extra["rollout_method"] = "median-of-3 single calls, 2 stream chunks"
            guard("rollout_ddim50", roll(s8))
            guard("rollout_dpmpp25", roll(s8, "dpmpp_2m", 25, tag="dpm"))
            guard("rollout_dpmpp20", roll(s8, "dpmpp_2m", 20, tag="dpm"))
            guard("rollout_dpmpp15", roll(s8, "dpmpp_2m", 15, tag="dpm"))
            if os.environ.get("BENCH_SPLIT_AB", "0") == "1":
                guard("split_ab", split_ab)
        guard("layout_b1", layout_b1)
        guard("rollout_single_ddim50", single_scene(
            "ddim", None, "rollout_16frame_wall_s_50step_ddim",
            "single-scene rollout"))
        guard("rollout_single_dpmpp25", single_scene(
            "dpmpp_2m", 25, "rollout_16frame_wall_s_25step_dpmpp2m",
            "single-scene rollout DPM++(2M)@25"))
        guard("train_step", train)
        if os.environ.get("BENCH_SOLVER_CERT", "1") != "0":
            guard("solver_cert", cert)
        if errors:
            extra["errors"] = errors

    print(
        json.dumps(
            {
                "metric": "frames_per_sec_per_chip_50step_ddim_32x1024",
                "value": round(frames_per_sec, 3),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_sec / target, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
