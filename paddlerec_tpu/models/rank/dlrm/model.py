"""DLRM: bottom MLP on dense + dot-interaction + top MLP.

Parity target: reference models/rank/dlrm/net.py — bot_layer_sizes project
dense features to the embedding dim; pairwise dot products between the
dense vector and all slot embeddings feed the top MLP (top_layer_sizes).
SGD optimizer per the reference config.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP


class DLRMNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    bot_layer_sizes: Sequence[int]
    top_layer_sizes: Sequence[int]
    self_interaction: bool = False

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        emb = SlotEmbedding(self.vocab_size, self.embedding_dim, name="embedding")(
            sparse_ids
        )  # (B, S, E)
        bot = MLP(list(self.bot_layer_sizes), name="bot_mlp")(dense)  # (B, E)
        vecs = jnp.concatenate([bot[:, None, :], emb], axis=1)  # (B, S+1, E)
        # pairwise dots (MXU batched matmul), upper triangle
        dots = jnp.einsum("bie,bje->bij", vecs, vecs)
        n = vecs.shape[1]
        iu = jnp.triu_indices(n, k=0 if self.self_interaction else 1)
        flat = dots[:, iu[0], iu[1]]  # (B, n*(n-1)/2)
        feat = jnp.concatenate([bot, flat], axis=-1)
        top = MLP(list(self.top_layer_sizes), name="top_mlp")(feat)
        if top.shape[-1] == 2:  # reference ends with a 2-unit softmax head
            return top[:, 1] - top[:, 0]
        return top[:, 0]


@register_model("rank.dlrm")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = DLRMNet(
            self.vocab_size,
            self.embedding_dim,
            config.hyper("bot_layer_sizes", [512, 256, 64, self.embedding_dim]),
            config.hyper("top_layer_sizes", [512, 256, 2]),
            bool(config.hyper("self_interaction", False)),
        )
