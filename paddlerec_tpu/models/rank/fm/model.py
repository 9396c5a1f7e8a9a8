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
        dense_w = self.param(
            "dense_w", nn.initializers.normal(1e-4), (dense.shape[-1],)
        )
        bias = self.param("bias", nn.initializers.zeros, ())
        return first + dense @ dense_w + fm_second_order(emb) + bias


@register_model("rank.fm")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = FMNet(self.vocab_size, self.embedding_dim)
