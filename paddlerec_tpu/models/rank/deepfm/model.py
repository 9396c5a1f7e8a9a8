"""DeepFM: FM first + second order + DNN over shared embeddings.

Parity target: reference models/rank/deepfm/net.py:21-174 —
first-order sparse/dense weights (net.py:60-103), second-order sum-square −
square-sum over field embeddings (net.py:116-137), DNN tower over the
flattened embeddings, summed into one sigmoid logit.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP, FMFirstOrder, fm_second_order


class DeepFMNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    fc_sizes: Sequence[int]
    use_dense_in_fm: bool = True

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        # first order
        first = FMFirstOrder(self.vocab_size, name="fm_first")(
            sparse_ids, dense if self.use_dense_in_fm else None
        )
        # shared embeddings
        emb = SlotEmbedding(self.vocab_size, self.embedding_dim, name="embedding")(
            sparse_ids
        )  # (B, S, E)
        # second order
        second = fm_second_order(emb)
        # deep tower
        b = emb.shape[0]
        feat = jnp.concatenate([emb.reshape(b, -1), dense], axis=-1)
        hidden = MLP(list(self.fc_sizes), name="tower")(feat)
        deep = nn.Dense(1, name="head")(hidden)[:, 0]
        return first + second + deep


@register_model("rank.deepfm")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        fc_sizes = config.hyper("fc_sizes", [512, 256, 128, 32])
        self.module = DeepFMNet(self.vocab_size, self.embedding_dim, fc_sizes)
