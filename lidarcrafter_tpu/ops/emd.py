"""Approximate Earth Mover's Distance via the auction algorithm.

TPU-native re-design of the reference CUDA kernel
(``lidargen/metrics/modules/emd/emd_cuda.cu`` 316 LoC, wrapper
``emd_module.py:47-60``): the Bid / GetMax / Assign phases become dense masked
reductions (``top_k`` + ``segment_max``) inside a ``lax.fori_loop`` — the same
auction with deterministic tie-breaking instead of CUDA atomics.

The bidding phase never materialises the (n, n) distance matrix: rows are
processed in chunks of ``chunk`` inside the loop (distances via the
``|a|² + |b|² − 2a·b`` matmul form, so the hot op is an MXU (chunk, D)×(D, n)
matmul).  At the reference's eval scale (26k padded points,
``evaluate_our.py:56-61``) peak temp memory is chunk·n·4 B ≈ 100 MB instead of
the ~2.7 GB a dense matrix would need.

Semantics (cf. ``emd_module.py:6-18``): both clouds are (B, N, D) with equal N
(the reference requires N % 1024 == 0 and B ≤ 512 for its launch geometry —
not needed here), values normalized to [0, 1].  Returns squared distances
(B, N) (``sqrt(dist)`` = L2) and the (non-bijective on early stop) assignment
of each xyz1 point to an xyz2 point.  Gradients flow to ``xyz1`` only through
the distances, as in the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _auction_single(x1: jnp.ndarray, x2: jnp.ndarray, eps: float, iters: int, chunk: int):
    n = x1.shape[0]
    chunk = min(chunk, n)
    pad = (-n) % chunk
    x1p = jnp.pad(x1, ((0, pad), (0, 0)))
    sq1 = jnp.sum(x1p * x1p, axis=-1).reshape(-1, chunk)
    x1c = x1p.reshape(-1, chunk, x1.shape[-1])
    sq2 = jnp.sum(x2 * x2, axis=-1)
    x2t = x2.T
    k_ids = jnp.arange(n, dtype=jnp.int32)

    def row_top2(price):
        """Per row i: top-2 of value(i, ·) = 3 − ‖x1ᵢ − x2ⱼ‖ − priceⱼ, chunked."""

        def one(args):
            xc, s1 = args
            d2 = s1[:, None] + sq2[None, :] - 2.0 * jnp.dot(
                xc, x2t, preferred_element_type=jnp.float32
            )
            # auction value uses L2 (cf. ``emd_cuda.cu:146``: 3.0 - sqrt - price)
            value = 3.0 - jnp.sqrt(jnp.maximum(d2, 0.0)) - price[None, :]
            top2, top2_idx = jax.lax.top_k(value, 2)
            return top2, top2_idx[:, 0].astype(jnp.int32)

        top2, best = jax.lax.map(one, (x1c, sq1))
        return top2.reshape(-1, 2)[:n], best.reshape(-1)[:n]

    def body(i, state):
        assignment, assignment_inv, price = state
        unass = assignment < 0
        top2, best_k = row_top2(price)
        incr = top2[:, 0] - top2[:, 1] + eps
        bid_inc = jnp.where(unass, incr, -jnp.inf)

        is_last = i == iters - 1

        def last_assign(_):
            new_assignment = jnp.where(unass, best_k, assignment)
            return new_assignment, assignment_inv, price

        def normal_assign(_):
            seg = jnp.where(unass, best_k, n)
            max_inc = jax.ops.segment_max(bid_inc, seg, num_segments=n + 1)[:n]
            has = max_inc > -jnp.inf
            # deterministic winner: smallest j achieving the max bid
            hit = unass & (bid_inc >= max_inc[best_k])
            cand = jnp.where(hit, jnp.arange(n, dtype=jnp.int32), n)
            winner = jax.ops.segment_min(cand, seg, num_segments=n + 1)[:n]
            winner = jnp.where(has, winner, n)
            # evict previous owners of won targets
            owners = jnp.where(has & (assignment_inv >= 0), assignment_inv, n)
            a = assignment.at[owners].set(-1, mode="drop")
            a = a.at[jnp.where(winner < n, winner, n)].set(k_ids, mode="drop")
            inv = jnp.where(has, winner.astype(jnp.int32), assignment_inv)
            p = price + jnp.where(has, jnp.maximum(max_inc, 0.0), 0.0)
            return a, inv, p

        return jax.lax.cond(is_last, last_assign, normal_assign, None)

    init = (
        jnp.full((n,), -1, jnp.int32),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), x1.dtype),
    )
    assignment, _, _ = jax.lax.fori_loop(0, iters, body, init)
    assignment = jnp.clip(assignment, 0, n - 1)
    # exact per-pair distance (no matrix gather; keeps grads to x1)
    out_d2 = jnp.sum((x1 - x2[assignment]) ** 2, axis=-1)
    return out_d2, assignment


@partial(jax.jit, static_argnames=("eps", "iters", "chunk"))
def emd_auction(
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    eps: float = 0.005,
    iters: int = 50,
    chunk: int = 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N, D) × (B, N, D) → (dist² (B, N), assignment (B, N))."""
    assert xyz1.shape == xyz2.shape
    fn = partial(_auction_single, eps=eps, iters=iters, chunk=chunk)
    return jax.vmap(fn)(xyz1, xyz2)


def emd_metric(
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    eps: float = 0.005,
    iters: int = 50,
    chunk: int = 1024,
):
    """Scalar EMD as used by the eval suite (``metric_utils.py:447-458``):
    mean over points of sqrt(dist²)."""
    d2, _ = emd_auction(xyz1, xyz2, eps=eps, iters=iters, chunk=chunk)
    return jnp.mean(jnp.sqrt(jnp.maximum(d2, 0.0)))
