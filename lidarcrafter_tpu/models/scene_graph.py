"""Scene-graph condition encoder (tri-partite GCN) in flax.

TPU-native re-design of ``lidargen/models/unets/scene_graph.py:6-149``
(``SceneGraph``): CLIP(512)-augmented node/edge embeddings → encoder GCN →
manipulation GCN supporting graph edits (added nodes get zero latents,
added/manipulated nodes get noise change-flags, cf. ``scene_graph.py:118-147``).

The reference edits the flat node list host-side with Python loops; here the
graph arrives pre-padded with boolean edit masks:

- ``objs`` (N,) int         — class index per node (over the flat node batch)
- ``triples`` (T, 3) int    — (s, p, o) with node indices into the flat batch
- ``edge_mask`` (T,) bool
- ``text_feats`` (N, 512), ``rel_feats`` (T, 512) — precomputed CLIP features
- ``added_mask`` (N,) bool        — nodes added by an edit (zero latent)
- ``manipulated_mask`` (N,) bool  — nodes whose relationship changed

A single flat node axis serves the whole batch (scene membership is carried by
``obj_to_scene`` ids downstream), exactly like the reference's collation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .graph import GraphTripleConvNet


class SceneGraph(nn.Module):
    num_objs: int = 9  # len(set(object_idx_to_name))
    num_preds: int = 16  # len(set(pred_idx_to_name))
    embedding_dim: int = 64
    gconv_pooling: str = "avg"
    gconv_num_layers: int = 5
    mlp_normalization: str = "none"
    separated: bool = False
    replace_latent: bool = False
    residual: bool = False
    use_angles: bool = False
    use_clip: bool = True

    @property
    def add_dim(self) -> int:
        return 512 if self.use_clip else 0

    @property
    def out_dim_ini_encoder(self) -> int:
        return self.embedding_dim * 2 + self.add_dim

    @nn.compact
    def __call__(
        self,
        objs: jnp.ndarray,
        triples: jnp.ndarray,
        text_feats: jnp.ndarray,
        rel_feats: jnp.ndarray,
        added_mask: jnp.ndarray | None = None,
        manipulated_mask: jnp.ndarray | None = None,
        edge_mask: jnp.ndarray | None = None,
        rng: jax.Array | None = None,
        use_running_average: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (latent_obj_vecs (N, 2E+512), obj_embed_ (N, 512+2E))."""
        gdim = self.embedding_dim
        N = objs.shape[0]
        s, p, o = triples[:, 0], triples[:, 1], triples[:, 2]
        edges = jnp.stack([s, o], axis=1)
        if added_mask is None:
            added_mask = jnp.zeros((N,), bool)
        if manipulated_mask is None:
            manipulated_mask = jnp.zeros((N,), bool)

        obj_emb_ec = nn.Embed(self.num_objs + 1, gdim * 2, name="obj_embeddings_ec")
        pred_emb_ec = nn.Embed(self.num_preds, gdim * 2, name="pred_embeddings_ec")
        pred_emb_man = nn.Embed(
            self.num_preds, gdim * 2, name="pred_embeddings_man_dc"
        )

        # --- encoder (cf. init_encoder :80-94)
        obj_embed = obj_emb_ec(objs)
        pred_embed = pred_emb_ec(p)
        if self.use_clip:
            obj_embed = jnp.concatenate([text_feats, obj_embed], axis=1)
            pred_embed = jnp.concatenate([rel_feats, pred_embed], axis=1)

        latent_obj, _latent_pred = GraphTripleConvNet(
            input_dim_obj=self.out_dim_ini_encoder,
            input_dim_pred=self.out_dim_ini_encoder,
            hidden_dim=gdim * 4,
            pooling=self.gconv_pooling,
            num_layers=self.gconv_num_layers,
            mlp_normalization=self.mlp_normalization,
            residual=self.residual,
            output_dim=self.out_dim_ini_encoder,
            name="gconv_net_ec",
        )(obj_embed, pred_embed, edges, edge_mask, use_running_average)

        # --- graph edits (cf. forward :118-138)
        latent_obj = jnp.where(added_mask[:, None], 0.0, latent_obj)
        touched = added_mask | manipulated_mask
        if rng is None:
            change = jnp.zeros((N, gdim), latent_obj.dtype)
        else:
            change = jax.random.normal(rng, (N, gdim), latent_obj.dtype)
        change = jnp.where(touched[:, None], change, 0.0)
        latent_in = jnp.concatenate([latent_obj, change], axis=1)

        # --- manipulation GCN (cf. manipulate :96-110)
        obj_embed_ = obj_emb_ec(objs)
        pred_embed_ = pred_emb_man(p)
        if self.use_clip:
            obj_embed_ = jnp.concatenate([text_feats, obj_embed_], axis=1)
            pred_embed_ = jnp.concatenate([rel_feats, pred_embed_], axis=1)
        man_in = jnp.concatenate([latent_in, obj_embed_], axis=1)
        latent_man, _ = GraphTripleConvNet(
            input_dim_obj=self.out_dim_ini_encoder + gdim + gdim * 2 + self.add_dim,
            input_dim_pred=gdim * 2 + self.add_dim,
            hidden_dim=gdim * 4,
            pooling=self.gconv_pooling,
            num_layers=min(self.gconv_num_layers, 5),
            mlp_normalization=self.mlp_normalization,
            residual=self.residual,
            output_dim=self.embedding_dim * 2 + self.add_dim,
            name="gconv_net_manipulation",
        )(man_in, pred_embed_, edges, edge_mask, use_running_average)

        if self.replace_latent:
            latent_out = latent_man
        else:
            latent_out = jnp.where(touched[:, None], latent_man, latent_obj)
        return latent_out, obj_embed_
