"""DeepFEFM: field-embedded FM + DNN.

Parity target: reference models/rank/deepfefm/net.py — symmetric field-pair
matrices W_ij transform e_i before the pairwise dot with e_j; the pairwise
interaction scalars sum into the FEFM logit, the interaction *embeddings*
concat with the raw embeddings into the DNN branch.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP


class DeepFEFMNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    num_fields: int
    fc_sizes: tuple = (1024, 1024, 1024)

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        s, e = self.num_fields, self.embedding_dim
        fused = SlotEmbedding(self.vocab_size, e + 1, name="embedding")(sparse_ids)
        emb = fused[..., :e]  # (B, S, E)
        first = fused[..., e].sum(axis=1)
        b = emb.shape[0]

        n_pairs = s * (s - 1) // 2
        w_pairs = self.param(
            "field_pair_w",
            nn.initializers.normal(1.0 / jnp.sqrt(e)),
            (n_pairs, e, e),
        )
        iu, ju = jnp.triu_indices(s, k=1)
        ei = emb[:, iu, :]  # (B, P, E)
        ej = emb[:, ju, :]
        # symmetrize: e_i (W + Wᵀ) then dot e_j
        w_sym = w_pairs + jnp.swapaxes(w_pairs, -1, -2)
        ei_t = jnp.einsum("bpe,pef->bpf", ei, w_sym)
        inter = ei_t * ej  # (B, P, E) interaction embeddings
        fefm_logit = inter.sum(axis=(1, 2))

        dnn_in = jnp.concatenate(
            [emb.reshape(b, -1), inter.reshape(b, -1), dense], axis=-1
        )
        hidden = MLP(list(self.fc_sizes), name="tower")(dnn_in)
        deep = nn.Dense(1, name="head")(hidden)[:, 0]
        bias = self.param("bias", nn.initializers.zeros, ())
        return first + fefm_logit + deep + bias


@register_model("rank.deepfefm")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = DeepFEFMNet(
            self.vocab_size,
            self.embedding_dim,
            self.num_sparse,
            tuple(config.hyper("fc_sizes", [1024, 1024, 1024])),
        )
