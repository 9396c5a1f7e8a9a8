"""FGCNN: feature generation by CNN + deep classifier.

Parity target: reference models/rank/fgcnn/net.py — CNN (conv + pooling
over the field×embedding matrix) generates new feature maps that are
recombined into extra "generated" fields; original + generated fields feed
an inner-product (IPNN-style) interaction and a DNN.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP


class FGCNNNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    num_fields: int
    conv_filters: Sequence[int] = (38, 40)
    new_maps: Sequence[int] = (3, 3)
    pool_sizes: Sequence[int] = (2, 2)
    fc_sizes: tuple = (128, 64)

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        e = self.embedding_dim
        emb = SlotEmbedding(self.vocab_size, e, name="embedding")(sparse_ids)
        b, s, _ = emb.shape

        # feature generation: conv over (fields, emb) image
        x = emb[..., None]  # (B, S, E, 1)
        generated = []
        fields = s
        for i, (filt, maps, pool) in enumerate(
            zip(self.conv_filters, self.new_maps, self.pool_sizes)
        ):
            x = nn.Conv(filt, kernel_size=(7, 1), padding="SAME",
                        name=f"conv_{i}")(x)
            x = jnp.tanh(x)
            x = nn.max_pool(x, window_shape=(pool, 1), strides=(pool, 1))
            fields = fields // pool
            flat = x.reshape(b, -1)
            new_feats = jnp.tanh(
                nn.Dense(fields * maps * e, name=f"recombine_{i}")(flat)
            )
            generated.append(new_feats.reshape(b, fields * maps, e))

        all_fields = jnp.concatenate([emb] + generated, axis=1)  # (B, F', E)
        # inner-product interactions (upper triangle)
        dots = jnp.einsum("bie,bje->bij", all_fields, all_fields)
        f = all_fields.shape[1]
        iu = jnp.triu_indices(f, k=1)
        inter = dots[:, iu[0], iu[1]]
        dnn_in = jnp.concatenate(
            [all_fields.reshape(b, -1), inter, dense], axis=-1
        )
        hidden = MLP(list(self.fc_sizes), name="tower")(dnn_in)
        return nn.Dense(1, name="head")(hidden)[:, 0]


@register_model("rank.fgcnn")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = FGCNNNet(
            self.vocab_size,
            self.embedding_dim,
            self.num_sparse,
            tuple(config.hyper("conv_filters", [38, 40])),
            tuple(config.hyper("new_maps", [3, 3])),
            tuple(config.hyper("pooling_sizes", [2, 2])),
            tuple(config.hyper("fc_sizes", [128, 64])),
        )
