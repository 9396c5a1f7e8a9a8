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
from paddlerec_tpu.ops.layers import MLP, fm_second_order


class DeepFMNet(nn.Module):
    """TPU layout note: the FM first-order weight is folded into the shared
    table as one extra feature lane (the packed layout rounds E=9 up to a
    16-lane window anyway), so ONE gather serves first order, second order
    and the deep tower — vs the reference's two separate tables
    (models/rank/deepfm/net.py:60-103)."""

    vocab_size: int
    embedding_dim: int
    fc_sizes: Sequence[int]
    use_dense_in_fm: bool = True
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
        )(sparse_ids)  # (B, S, E+1): lanes [0:E] = emb, lane E = w1
        emb = fused[..., : self.embedding_dim]
        # first order: per-id scalar weight (init scale matched via 1e-2
        # table init; reference uses a separate 1e-4-init rank-1 table)
        first = fused[..., self.embedding_dim].sum(axis=1)
        if self.use_dense_in_fm:
            dense_w = self.param(
                "dense_w", nn.initializers.normal(1e-4), (dense.shape[-1],)
            )
            first = first + dense @ dense_w
        bias = self.param("fm_bias", nn.initializers.zeros, ())
        # second order
        second = fm_second_order(emb)
        # deep tower
        b = emb.shape[0]
        feat = jnp.concatenate([emb.reshape(b, -1), dense], axis=-1)
        hidden = MLP(list(self.fc_sizes), name="tower")(feat)
        deep = nn.Dense(1, name="head")(hidden)[:, 0]
        return first + second + deep + bias


@register_model("rank.deepfm")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        fc_sizes = config.hyper("fc_sizes", [512, 256, 128, 32])
        self.sparse_embed_logical_dim = self.embedding_dim + 1  # fused w1 lane
        kw = self.sparse_embed_kwargs()
        self.module = DeepFMNet(
            self.vocab_size, self.embedding_dim, fc_sizes,
            external_update=kw.get("external_update", False),
            delta_capacity=kw.get("delta_capacity", 0),
            table_dtype=self.table_dtype(),
        )
