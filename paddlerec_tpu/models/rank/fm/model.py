"""Factorization Machine: first order + pairwise second order.

Parity target: reference models/rank/fm/net.py — rank-1 weights + shared
embeddings with the sum-square − square-sum interaction, sigmoid output.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import fm_second_order


class FMNet(nn.Module):
    vocab_size: int
    embedding_dim: int

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        fused = SlotEmbedding(
            self.vocab_size, self.embedding_dim + 1, name="embedding"
        )(sparse_ids)
        emb = fused[..., : self.embedding_dim]
        first = fused[..., self.embedding_dim].sum(axis=1)
        # reference embeds dense as extra FM fields (net.py:107-128):
        # value × learned vector joins the sum-square interaction, and
        # the first-order dense weight is Constant(1.0)-initialized
        dense_w = self.param(
            "dense_w", nn.initializers.ones, (dense.shape[-1],)
        )
        dense_emb_w = self.param(
            "dense_emb_w", nn.initializers.normal(1e-2),
            (dense.shape[-1], self.embedding_dim),
        )
        dense_fields = dense[..., None] * dense_emb_w[None]  # (B, D, E)
        fields = jnp.concatenate([emb, dense_fields], axis=1)
        bias = self.param("bias", nn.initializers.zeros, ())
        return first + dense @ dense_w + fm_second_order(fields) + bias


@register_model("rank.fm")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.sparse_embed_logical_dim = self.embedding_dim + 1  # fused lane
        self.module = FMNet(self.vocab_size, self.embedding_dim)
