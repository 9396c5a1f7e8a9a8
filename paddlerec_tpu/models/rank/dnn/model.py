"""CtrDnn: embedding + MLP — the workhorse CTR baseline.

Parity target: reference models/rank/dnn/net.py:21-91 — shared sparse table,
per-slot embeddings concatenated with dense features, `fc_sizes` ReLU tower,
final linear to one logit.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP


class CtrDnnNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    fc_sizes: Sequence[int]
    external_update: bool = False
    delta_capacity: int = 0
    table_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        emb = SlotEmbedding(
            self.vocab_size, self.embedding_dim, name="embedding",
            external_update=self.external_update,
            delta_capacity=self.delta_capacity,
            param_dtype=self.table_dtype,
        )(sparse_ids)  # (B, S, E)
        b = emb.shape[0]
        feat = jnp.concatenate([emb.reshape(b, -1), dense], axis=-1)
        hidden = MLP(list(self.fc_sizes), name="tower")(feat)
        logit = nn.Dense(1, name="head")(hidden)
        return logit[:, 0]


@register_model("rank.dnn")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        fc_sizes = config.hyper("fc_sizes", [512, 256, 128, 32])
        kw = self.sparse_embed_kwargs()
        self.module = CtrDnnNet(
            self.vocab_size, self.embedding_dim, fc_sizes,
            external_update=kw.get("external_update", False),
            delta_capacity=kw.get("delta_capacity", 0),
            table_dtype=self.table_dtype(),
        )
