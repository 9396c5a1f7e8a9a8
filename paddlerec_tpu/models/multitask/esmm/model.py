"""ESMM: entire-space multitask CTR×CVR.

Parity target: reference models/multitask/esmm/net.py — shared embedding
(sum-pooled per field), separate ctr/cvr MLP towers, pCTCVR = pCTR · pCVR,
loss = BCE(ctr) + BCE(ctcvr) on the entire space.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.multitask.base import AliCCPModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP


class ESMMNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    num_field: int
    ctr_fc_sizes: Sequence[int]
    cvr_fc_sizes: Sequence[int]

    @nn.compact
    def __call__(self, sparse_ids, sparse_mask=None):
        emb = SlotEmbedding(
            self.vocab_size, self.embedding_dim, combiner="sum", name="embedding"
        )(sparse_ids, sparse_mask)  # (B, F, E)
        b = emb.shape[0]
        feat = emb.reshape(b, -1)
        ctr_h = MLP(list(self.ctr_fc_sizes), name="ctr_tower")(feat)
        ctr_prob = nn.sigmoid(nn.Dense(1, name="ctr_head")(ctr_h))[:, 0]
        cvr_h = MLP(list(self.cvr_fc_sizes), name="cvr_tower")(feat)
        cvr_prob = nn.sigmoid(nn.Dense(1, name="cvr_head")(cvr_h))[:, 0]
        return ctr_prob, cvr_prob


@register_model("multitask.esmm")
class ModelDef(AliCCPModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = ESMMNet(
            self.vocab_size,
            self.embedding_dim,
            self.num_field,
            config.hyper("ctr_fc_sizes", [256, 64]),
            config.hyper("cvr_fc_sizes", [256, 64]),
        )
