"""Scene-graph triple convolutions (flax) with fixed-size padded graphs.

TPU-native re-design of ``lidargen/models/unets/graph.py:89-250``
(``GraphTripleConv``/``GraphTripleConvNet``) and ``layers.py:21-38``
(``build_mlp``): the reference scatters over a flat variable-length node batch;
here graphs are padded to static (num_nodes, num_edges) with masks, and the
message pooling is a masked ``segment_sum`` — the natural XLA formulation.

``mlp_normalization='batch'`` uses a masked BatchNorm over the valid nodes /
edges (running stats in the ``batch_stats`` collection), mirroring the
reference's ``nn.BatchNorm1d`` over its flat batch.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid rows only; padded rows don't pollute stats."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = True):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(C))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(C))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                mean = jnp.mean(x, axis=0)
                var = jnp.var(x, axis=0)
            else:
                m = mask.astype(x.dtype)[:, None]
                n = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=0) / n
                var = jnp.sum(((x - mean) ** 2) * m, axis=0) / n
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class MLP(nn.Module):
    """cf. ``layers.py:21-38`` (build_mlp): Linear (+BN) (+ReLU) per layer."""

    dims: Sequence[int]  # output dims per layer
    batch_norm: str = "none"
    final_nonlinearity: bool = True

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = True):
        n = len(self.dims)
        for i, d in enumerate(self.dims):
            x = nn.Dense(
                d, kernel_init=nn.initializers.kaiming_normal(), name=f"lin{i}"
            )(x)
            final = i == n - 1
            if not final or self.final_nonlinearity:
                if self.batch_norm == "batch":
                    x = MaskedBatchNorm(name=f"bn{i}")(x, mask, use_running_average)
                x = nn.relu(x)
        return x


class GraphTripleConv(nn.Module):
    """One scene-graph conv layer; cf. ``graph.py:89-211``.

    ``obj_vecs`` (N, Do), ``pred_vecs`` (T, Dp), ``edges`` (T, 2) int,
    ``edge_mask`` (T,) — padded triples route to a trash segment.
    """

    input_dim_pred: int
    output_dim: int
    hidden_dim: int = 512
    pooling: str = "avg"
    mlp_normalization: str = "none"
    residual: bool = False

    @nn.compact
    def __call__(self, obj_vecs, pred_vecs, edges, edge_mask=None,
                 use_running_average: bool = True):
        N = obj_vecs.shape[0]
        T = pred_vecs.shape[0]
        H, Dp, Dout = self.hidden_dim, self.input_dim_pred, self.output_dim
        if edge_mask is None:
            edge_mask = jnp.ones((T,), bool)

        s_idx, o_idx = edges[:, 0], edges[:, 1]
        cur_t = jnp.concatenate(
            [obj_vecs[s_idx], pred_vecs, obj_vecs[o_idx]], axis=1
        )
        new_t = MLP(
            (H, 2 * H + Dp), batch_norm=self.mlp_normalization, name="net1"
        )(cur_t, edge_mask, use_running_average)
        new_s = new_t[:, :H]
        new_p = new_t[:, H : H + Dp]
        new_o = new_t[:, H + Dp :]

        em = edge_mask.astype(obj_vecs.dtype)[:, None]
        seg_s = jnp.where(edge_mask, s_idx, N)
        seg_o = jnp.where(edge_mask, o_idx, N)
        pooled = jax.ops.segment_sum(new_s * em, seg_s, num_segments=N + 1)[:N]
        pooled += jax.ops.segment_sum(new_o * em, seg_o, num_segments=N + 1)[:N]

        if self.pooling == "avg":
            ones = em[:, 0]
            counts = jax.ops.segment_sum(ones, seg_s, num_segments=N + 1)[:N]
            counts += jax.ops.segment_sum(ones, seg_o, num_segments=N + 1)[:N]
            pooled = pooled / jnp.maximum(counts, 1.0)[:, None]
        elif self.pooling != "sum":
            raise NotImplementedError(self.pooling)

        node_mask = jnp.ones((N,), bool)
        new_obj = MLP(
            (H, Dout), batch_norm=self.mlp_normalization, name="net2"
        )(pooled, node_mask, use_running_average)

        if self.residual:
            new_obj = new_obj + nn.Dense(Dout, name="linear_projection")(obj_vecs)
            new_p = new_p + nn.Dense(Dp, name="linear_projection_pred")(pred_vecs)
        return new_obj, new_p


class GraphTripleConvNet(nn.Module):
    """Stack of graph convs; cf. ``graph.py:214-250``."""

    input_dim_obj: int
    input_dim_pred: int
    num_layers: int = 2
    hidden_dim: int = 512
    residual: bool = False
    pooling: str = "avg"
    mlp_normalization: str = "none"
    output_dim: int | None = None

    @nn.compact
    def __call__(self, obj_vecs, pred_vecs, edges, edge_mask=None,
                 use_running_average: bool = True):
        for i in range(self.num_layers):
            last = self.output_dim is not None and i >= self.num_layers - 1
            out_dim = self.output_dim if last else obj_vecs.shape[-1]
            obj_vecs, pred_vecs = GraphTripleConv(
                input_dim_pred=self.input_dim_pred,
                output_dim=out_dim,
                hidden_dim=self.hidden_dim,
                pooling=self.pooling,
                mlp_normalization=self.mlp_normalization,
                residual=self.residual,
                name=f"gconv{i}",
            )(obj_vecs, pred_vecs, edges, edge_mask, use_running_average)
        return obj_vecs, pred_vecs
