"""Wide&Deep: wide LR over sparse ids + deep MLP.

Parity target: reference models/rank/wide_deep/net.py — wide part is a
rank-1 per-id weight (+dense linear), deep part an MLP over
[slot embeddings, dense].  TPU layout: the wide weight rides in an extra
lane of the shared packed table (one gather serves both parts).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP


class WideDeepNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    fc_sizes: Sequence[int]
    external_update: bool = False
    delta_capacity: int = 0
    table_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        fused = SlotEmbedding(
            self.vocab_size, self.embedding_dim + 1, name="embedding",
            external_update=self.external_update,
            delta_capacity=self.delta_capacity,
            param_dtype=self.table_dtype,
        )(sparse_ids)
        emb = fused[..., : self.embedding_dim]  # (B, S, E)
        wide = fused[..., self.embedding_dim].sum(axis=1)
        dense_w = self.param(
            "wide_dense_w", nn.initializers.normal(1e-4), (dense.shape[-1],)
        )
        wide = wide + dense @ dense_w
        b = emb.shape[0]
        feat = jnp.concatenate([emb.reshape(b, -1), dense], axis=-1)
        hidden = MLP(list(self.fc_sizes), name="tower")(feat)
        deep = nn.Dense(1, name="head")(hidden)[:, 0]
        bias = self.param("bias", nn.initializers.zeros, ())
        return wide + deep + bias


@register_model("rank.wide_deep")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        fc_sizes = config.hyper("fc_sizes", [512, 256, 128, 32])
        self.sparse_embed_logical_dim = self.embedding_dim + 1  # fused w1 lane
        kw = self.sparse_embed_kwargs()
        self.module = WideDeepNet(
            self.vocab_size, self.embedding_dim, fc_sizes,
            external_update=kw.get("external_update", False),
            delta_capacity=kw.get("delta_capacity", 0),
            table_dtype=self.table_dtype(),
        )
