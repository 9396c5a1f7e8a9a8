"""FLEN: field-leveraged embedding network.

Parity target: reference models/rank/flen/net.py — fields are partitioned
into groups (user / item / context); the field-wise bi-interaction combines
an MF part (cross-group inner products) and an FM part (within-group
sum-square − square-sum), concatenated with a DNN branch.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP


class FLENNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    num_fields: int
    field_groups: Sequence[int]  # sizes of each group, sums to num_fields
    fc_sizes: tuple = (64, 32)

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        e = self.embedding_dim
        emb = SlotEmbedding(self.vocab_size, e, name="embedding")(sparse_ids)
        b = emb.shape[0]
        # group-sum embeddings
        sums = []
        fm_parts = []
        start = 0
        for gi, size in enumerate(self.field_groups):
            g = emb[:, start : start + size, :]
            start += size
            sums.append(g.sum(axis=1))  # (B, E)
            # FM within group
            sq_sum = jnp.square(g.sum(axis=1))
            sum_sq = jnp.square(g).sum(axis=1)
            fm_parts.append(0.5 * (sq_sum - sum_sq))
        # MF across groups: pairwise elementwise products of group sums,
        # weighted per pair (learned r_ij)
        n_g = len(self.field_groups)
        mf = []
        for i in range(n_g):
            for j in range(i + 1, n_g):
                mf.append(sums[i] * sums[j])
        r = self.param(
            "pair_weight", nn.initializers.ones, (len(mf), 1, 1)
        )
        h_mf = sum(r[k, 0, 0] * m for k, m in enumerate(mf))  # (B, E)
        h_fm = sum(fm_parts)
        fwbi = jnp.concatenate([h_mf, h_fm], axis=-1)
        fwbi = nn.relu(nn.Dense(self.embedding_dim, name="fwbi_proj")(fwbi))

        dnn_in = jnp.concatenate([emb.reshape(b, -1), dense], axis=-1)
        deep = MLP(list(self.fc_sizes), name="tower")(dnn_in)
        final = jnp.concatenate([fwbi, deep], axis=-1)
        return nn.Dense(1, name="head")(final)[:, 0]


@register_model("rank.flen")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        groups = config.hyper("field_groups")
        if not groups:
            # default: split criteo's 26 fields into 3 pseudo-groups
            s = self.num_sparse
            groups = [s // 3, s // 3, s - 2 * (s // 3)]
        self.module = FLENNet(
            self.vocab_size,
            self.embedding_dim,
            self.num_sparse,
            groups,
            tuple(config.hyper("fc_sizes", [64, 32])),
        )
