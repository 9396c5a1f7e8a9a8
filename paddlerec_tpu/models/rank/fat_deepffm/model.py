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
        s, e = self.num_fields, self.embedding_dim
        # field-aware factors: (B, S, S*E) → (B, S_i, S_f, E)
        emb = SlotEmbedding(
            self.vocab_size, s * e, packed=False, name="embedding"
        )(sparse_ids)
        b = emb.shape[0]
        v = emb.reshape(b, s, s, e)

        iu, ju = jnp.triu_indices(s, k=1)
        inter = v[:, iu, ju, :] * v[:, ju, iu, :]  # (B, P, E) FFM interactions

        # CENet field attention over interaction pairs
        p = inter.shape[1]
        z = inter.mean(axis=-1)  # squeeze (B, P)
        a = nn.relu(nn.Dense(max(p // self.reduction, 1), name="ce_1")(z))
        a = nn.relu(nn.Dense(p, name="ce_2")(a))  # excitation (B, P)
        attended = inter * a[..., None]

        ffm_logit = attended.sum(axis=(1, 2))
        dnn_in = jnp.concatenate([attended.reshape(b, -1), dense], axis=-1)
        hidden = MLP(list(self.fc_sizes), name="tower")(dnn_in)
        deep = nn.Dense(1, name="head")(hidden)[:, 0]
        bias = self.param("bias", nn.initializers.zeros, ())
        return ffm_logit + deep + bias


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
