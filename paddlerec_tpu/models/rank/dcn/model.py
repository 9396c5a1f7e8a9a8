"""DCN: CrossNet (v1) + DNN in parallel, concat → logit.

Parity target: reference models/rank/dcn/net.py — cross_num cross layers
over [embeddings, dense], DNN branch, concatenated head; l2 regularization
on cross weights (l2_reg_cross) and global-norm gradient clipping
(clip_by_norm) from config.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP, CrossNet


class DCNNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    fc_sizes: Sequence[int]
    cross_num: int = 2
    dnn_use_bn: bool = False

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        emb = SlotEmbedding(self.vocab_size, self.embedding_dim, name="embedding")(
            sparse_ids
        )
        b = emb.shape[0]
        x0 = jnp.concatenate([emb.reshape(b, -1), dense], axis=-1)
        cross_out = CrossNet(self.cross_num, name="crossnet")(x0)
        deep_out = MLP(list(self.fc_sizes), name="tower")(x0)
        final = jnp.concatenate([cross_out, deep_out], axis=-1)
        return nn.Dense(1, name="head")(final)[:, 0]


@register_model("rank.dcn")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = DCNNet(
            self.vocab_size,
            self.embedding_dim,
            config.hyper("fc_sizes", [512, 256, 128]),
            int(config.hyper("cross_num", 2)),
            bool(config.hyper("dnn_use_bn", False)),
        )
        self.l2_reg_cross = float(config.hyper("l2_reg_cross", 0.0))

    def train_forward(self, params, batch):
        loss, aux = super().train_forward(params, batch)
        if self.l2_reg_cross:
            cross = params["crossnet"]
            l2 = sum(jnp.sum(v * v) for k, v in cross.items() if k.startswith("w"))
            loss = loss + self.l2_reg_cross * l2
        return loss, aux
