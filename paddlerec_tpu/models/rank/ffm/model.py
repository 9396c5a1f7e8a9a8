"""Field-aware FM:每个特征对每个 field 一套隐向量.

Parity target: reference models/rank/ffm/net.py — each feature i holds S
field-specific vectors v_{i,f}; the interaction term is
Σ_{i<j} <v_{i,field(j)}, v_{j,field(i)}>.

TPU note: the per-id factor block is S*E wide (26*9=234 for Criteo), wider
than one 128-lane window, so this model uses the plain (unpacked) table —
the lookup fetches contiguous (S*E)-wide rows, which is already
bandwidth-friendly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding


class FFMNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    num_fields: int

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        s, e, d = self.num_fields, self.embedding_dim, dense.shape[-1]
        f = s + d  # total fields — reference runs FFM over sparse AND
        # dense fields (39 on criteo; dygraph_model passes 26+13)
        # field-aware factors: (B, S, F*E) → (B, S_i, F, E)
        emb = SlotEmbedding(
            self.vocab_size, f * e, packed=False, name="embedding"
        )(sparse_ids)
        b = emb.shape[0]
        v_sparse = emb.reshape(b, s, f, e)
        # dense field-aware embeddings: value × (D, F, E) table
        dense_fw = self.param(
            "dense_field_emb", nn.initializers.normal(1e-2), (d, f, e)
        )
        v_dense = dense[..., None, None] * dense_fw[None]  # (B, D, F, E)
        v = jnp.concatenate([v_sparse, v_dense], axis=1)  # (B, F, F, E)
        # first order
        first = SlotEmbedding(
            self.vocab_size, 1, init_stddev=1e-4, name="first_weight"
        )(sparse_ids)[..., 0].sum(axis=1)
        dense_w = self.param(
            "dense_w", nn.initializers.normal(1e-4), (d,)
        )
        first = first + dense @ dense_w
        # Σ_{i<j} <v[i, j], v[j, i]> : full F×F dot matrix, keep upper tri
        dots = jnp.einsum("bije,bjie->bij", v, v)  # (B, F, F)
        iu = jnp.triu(jnp.ones((f, f)), k=1)
        second = (dots * iu).sum(axis=(1, 2))
        bias = self.param("bias", nn.initializers.zeros, ())
        return first + second + bias


@register_model("rank.ffm")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = FFMNet(self.vocab_size, self.embedding_dim, self.num_sparse)
