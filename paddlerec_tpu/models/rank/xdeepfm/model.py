"""xDeepFM: CIN (explicit vector-wise crosses) + DNN + linear.

Parity target: reference models/rank/xdeepfm/net.py:123-205 — config keys
layer_sizes_cin, layer_sizes_dnn; linear part = rank-1 weights (folded
into the shared packed table here).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import CIN, MLP


class XDeepFMNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    layer_sizes_dnn: Sequence[int]
    layer_sizes_cin: Sequence[int]

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        fused = SlotEmbedding(
            self.vocab_size, self.embedding_dim + 1, name="embedding"
        )(sparse_ids)
        emb = fused[..., : self.embedding_dim]  # (B, S, E)
        linear = fused[..., self.embedding_dim].sum(axis=1)
        dense_w = self.param(
            "dense_w", nn.initializers.normal(1e-4), (dense.shape[-1],)
        )
        linear = linear + dense @ dense_w

        # dense inputs become extra embedded fields (value × learned
        # vector, reference net.py:100-119) so CIN crosses dense×sparse
        dense_emb_w = self.param(
            "dense_emb_w", nn.initializers.normal(1e-2),
            (dense.shape[-1], self.embedding_dim),
        )
        dense_fields = dense[..., None] * dense_emb_w[None]  # (B, D, E)
        fields = jnp.concatenate([emb, dense_fields], axis=1)  # (B, S+D, E)

        # reference CIN has no split-half: every layer's full output
        # feeds forward AND the concat (net.py:123-205)
        cin_out = CIN(list(self.layer_sizes_cin), split_half=False,
                      name="cin")(fields)
        cin_logit = nn.Dense(1, name="cin_head")(cin_out)[:, 0]

        b = emb.shape[0]
        feat = fields.reshape(b, -1)
        dnn_hidden = MLP(list(self.layer_sizes_dnn), name="tower")(feat)
        dnn_logit = nn.Dense(1, name="dnn_head")(dnn_hidden)[:, 0]

        bias = self.param("bias", nn.initializers.zeros, ())
        return linear + cin_logit + dnn_logit + bias


@register_model("rank.xdeepfm")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.sparse_embed_logical_dim = self.embedding_dim + 1  # fused lane
        self.module = XDeepFMNet(
            self.vocab_size,
            self.embedding_dim,
            config.hyper("layer_sizes_dnn", [512, 256, 128]),
            config.hyper("layer_sizes_cin", [128, 32]),
        )
