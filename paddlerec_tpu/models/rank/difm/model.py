"""DIFM: dual input-aware factorization machine.

Parity target: reference models/rank/difm/net.py — a vector-wise FEN
(multi-head self-attention over field embeddings) and a bit-wise FEN (DNN)
each produce per-field input-aware weights; their sum reweights both the
first-order weights and the field embeddings before the FM interaction.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP, fm_second_order


class DIFMNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    num_fields: int
    att_heads: int = 4
    att_dim: int = 16
    fen_sizes: tuple = (256, 128)

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        s = self.num_fields
        fused = SlotEmbedding(
            self.vocab_size, self.embedding_dim + 1, name="embedding"
        )(sparse_ids)
        emb = fused[..., : self.embedding_dim]  # (B, S, E)
        w1 = fused[..., self.embedding_dim]  # (B, S)
        b = emb.shape[0]

        # vector-wise FEN: one self-attention block over fields
        h, hd = self.att_heads, self.att_dim
        q = nn.Dense(h * hd, use_bias=False, name="q")(emb)
        k = nn.Dense(h * hd, use_bias=False, name="k")(emb)
        v = nn.Dense(h * hd, use_bias=False, name="v")(emb)

        def split(t):
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        att = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(hd), axis=-1
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
        # W_Res residual projection (reference net.py:262)
        out = out + nn.Dense(h * hd, use_bias=False, name="w_res")(emb)
        m_vec = nn.Dense(1, name="vec_head")(out.reshape(b, s, -1))[..., 0]

        # bit-wise FEN: DNN over flattened embeddings
        bits = MLP(list(self.fen_sizes), name="bit_fen")(emb.reshape(b, -1))
        m_bit = nn.Dense(s, name="bit_head")(bits)

        # reference normalizes the input-aware factors with a softmax
        # over fields (net.py:340) — unnormalized sums can flip signs
        m = jax.nn.softmax(m_vec + m_bit, axis=-1) * s  # (B, S)
        first = (w1 * m).sum(axis=1)
        # dense joins as extra FM fields (reference FENLayer builds
        # sparse_field_num+1 fields including dense)
        dense_emb_w = self.param(
            "dense_emb_w", nn.initializers.normal(1e-2),
            (dense.shape[-1], self.embedding_dim),
        )
        dense_fields = dense[..., None] * dense_emb_w[None]
        dense_w = self.param(
            "dense_w", nn.initializers.normal(1e-4), (dense.shape[-1],)
        )
        fields = jnp.concatenate([emb * m[..., None], dense_fields], 1)
        second = fm_second_order(fields)
        bias = self.param("bias", nn.initializers.zeros, ())
        return first + dense @ dense_w + second + bias


@register_model("rank.difm")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.sparse_embed_logical_dim = self.embedding_dim + 1  # fused lane
        self.module = DIFMNet(
            self.vocab_size,
            self.embedding_dim,
            self.num_sparse,
            int(config.hyper("att_head_num", 4)),
            int(config.hyper("att_factor_dim", 16)),
            tuple(config.hyper("fen_layers_size", [256, 128])),
        )
