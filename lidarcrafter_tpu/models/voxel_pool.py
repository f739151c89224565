"""Voxel-neighborhood set-abstraction pooling (VoxelRCNN feature pooling).

TPU-native equivalent of the reference's ``NeighborVoxelSAModuleMSG``
(``lidargen/ops/pointnet2/pointnet2_stack/voxel_pool_modules.py:8-130``):
multi-scale voxel-window ball query (:func:`lidarcrafter_tpu.ops.stack.voxel_query`)
followed by per-scale channel MLP + position MLP, sum, ReLU, max/avg pool over
the ``nsample`` neighbors, and an output MLP; scale outputs concatenate.

Eval-mode BatchNorm (frozen affine) — this module backs the pretrained
VoxelRCNN detector used for metric evaluation.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..metrics.extractor.pointnet import FrozenBN
from ..ops.stack import voxel_query


class NeighborVoxelSAPool(nn.Module):
    """cf. ``NeighborVoxelSAModuleMSG`` (``voxel_pool_modules.py:8-130``).

    ``__call__(xyz (N,3), new_xyz (M,3), new_coords (M,4) [b,x,y,z] (reference
    order, reordered to bzyx internally like ``forward:84``), features (N,C),
    point_indices (B,Z,Y,X), masks)`` → (M, sum(mlps[k][-1])).
    """

    query_ranges: Sequence[Sequence[int]]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    pool_method: str = "max_pool"

    @nn.compact
    def __call__(
        self,
        xyz,
        new_xyz,
        new_coords,
        features,
        point_indices,
        new_mask=None,
    ):
        if new_mask is None:
            new_mask = jnp.ones((new_xyz.shape[0],), bool)
        new_coords_bzyx = new_coords[:, jnp.array([0, 3, 2, 1])]
        outs = []
        for k in range(len(self.query_ranges)):
            spec = self.mlps[k]
            f_in = nn.Dense(spec[1], use_bias=False, name=f"mlp_in{k}")(features)
            f_in = FrozenBN(name=f"mlp_in{k}_bn")(f_in)

            idx, empty = voxel_query(
                new_coords_bzyx, new_xyz, xyz, point_indices,
                query_range=tuple(self.query_ranges[k]),
                radius=float(self.radii[k]),
                nsample=int(self.nsamples[k]),
                new_mask=new_mask,
            )
            keep = (~empty & new_mask)[:, None, None]
            grouped = jnp.where(keep, f_in[idx], 0.0)          # (M, S, C1)
            gxyz = jnp.where(keep, xyz[idx] - new_xyz[:, None, :], 0.0)

            pos = nn.Dense(spec[1], use_bias=False, name=f"mlp_pos{k}")(gxyz)
            pos = FrozenBN(name=f"mlp_pos{k}_bn")(pos)
            h = nn.relu(grouped + pos)
            if self.pool_method == "max_pool":
                h = jnp.max(h, axis=1)
            elif self.pool_method == "avg_pool":
                h = jnp.mean(h, axis=1)
            else:
                raise NotImplementedError(self.pool_method)
            h = nn.Dense(spec[2], use_bias=False, name=f"mlp_out{k}")(h)
            h = nn.relu(FrozenBN(name=f"mlp_out{k}_bn")(h))
            outs.append(jnp.where(new_mask[:, None], h, 0.0))
        return jnp.concatenate(outs, axis=-1)
