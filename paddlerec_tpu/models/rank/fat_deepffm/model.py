"""FAT-DeepFFM: field-attentive deep field-aware FM.

Parity target: reference models/rank/fat_deepffm/net.py — CENet
(squeeze-excitation style) attention over the S×S field-pair FFM
embeddings, attended interactions summed into the FFM logit and flattened
into the deep branch.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP


class FATDeepFFMNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    num_fields: int
    reduction: int = 2
    fc_sizes: tuple = (1024, 512, 256)

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        s, e, d = self.num_fields, self.embedding_dim, dense.shape[-1]
        f = s + d  # reference runs over sparse AND dense fields (39)
        # field-aware factors: (B, S, F*E) → (B, S_i, F_f, E)
        emb = SlotEmbedding(
            self.vocab_size, f * e, packed=False, name="embedding"
        )(sparse_ids)
        b = emb.shape[0]
        v_sparse = emb.reshape(b, s, f, e)
        dense_fw = self.param(
            "dense_field_emb", nn.initializers.normal(1e-2), (d, f, e)
        )
        v = jnp.concatenate(
            [v_sparse, dense[..., None, None] * dense_fw[None]], axis=1
        )  # (B, F, F, E)

        # CENet: attention over ALL F² field-aware embeddings BEFORE the
        # interaction, squeeze = MAX over E (reference AdaptiveMaxPool1D,
        # net.py:221-222) — mean-squeezing post-interaction products
        # averaged away max-responsive features and gave each pair a
        # single weight instead of a_ij·a_ji
        z = v.max(axis=-1).reshape(b, f * f)  # (B, F²)
        a = nn.relu(nn.Dense(max(f * f // self.reduction, 1),
                             name="ce_1")(z))
        a = nn.relu(nn.Dense(f * f, name="ce_2")(a))  # (B, F²)
        v_att = v * a.reshape(b, f, f, 1)

        # first order = sum over all attended embeddings (net.py:221-222)
        first = v_att.sum(axis=(1, 2, 3))
        iu, ju = jnp.triu_indices(f, k=1)
        inter = v_att[:, iu, ju, :] * v_att[:, ju, iu, :]  # (B, P, E)
        dnn_in = inter.reshape(b, -1)
        hidden = MLP(list(self.fc_sizes), name="tower")(dnn_in)
        deep = nn.Dense(1, name="head")(hidden)[:, 0]
        bias = self.param("bias", nn.initializers.zeros, ())
        return first + deep + bias


@register_model("rank.fat_deepffm")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = FATDeepFFMNet(
            self.vocab_size,
            self.embedding_dim,
            self.num_sparse,
            int(config.hyper("reduction", 2)),
            tuple(config.hyper("fc_sizes", [1024, 512, 256])),
        )
