"""AutoInt: multi-head self-attention interaction over field embeddings.

Parity target: reference models/rank/autoint/net.py — fields (sparse slots
+ dense projected to one field each) embedded to attn_layer_sizes[0], then
stacked interacting layers of multi-head attention with residual, ReLU,
final linear to one logit.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding


class InteractingLayer(nn.Module):
    """One AutoInt block: MHA over the field axis + residual projection."""

    att_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, F, D)
        d = self.att_dim * self.num_heads
        q = nn.Dense(d, use_bias=False, name="q")(x)
        k = nn.Dense(d, use_bias=False, name="k")(x)
        v = nn.Dense(d, use_bias=False, name="v")(x)
        b, f, _ = x.shape

        def split(t):  # (B, F, H*A) → (B, H, F, A)
            return t.reshape(b, f, self.num_heads, self.att_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        scores = jnp.einsum("bhfa,bhga->bhfg", qh, kh)
        weights = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhfg,bhga->bhfa", weights, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, f, d)
        res = nn.Dense(d, use_bias=False, name="res")(x)
        return nn.relu(out + res)


class AutoIntNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    att_layer_num: int = 3
    att_dim: int = 8
    num_heads: int = 2
    dense_as_fields: bool = True

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        emb = SlotEmbedding(self.vocab_size, self.embedding_dim, name="embedding")(
            sparse_ids
        )  # (B, S, E)
        if self.dense_as_fields:
            # project each dense scalar to an E-dim field vector
            d = dense.shape[-1]
            w = self.param(
                "dense_field_w",
                nn.initializers.normal(1e-2),
                (d, self.embedding_dim),
            )
            dense_fields = dense[..., None] * w[None]  # (B, D, E)
            x = jnp.concatenate([emb, dense_fields], axis=1)
        else:
            x = emb
        for i in range(self.att_layer_num):
            x = InteractingLayer(self.att_dim, self.num_heads, name=f"att_{i}")(x)
        b = x.shape[0]
        return nn.Dense(1, name="head")(x.reshape(b, -1))[:, 0]


@register_model("rank.autoint")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = AutoIntNet(
            self.vocab_size,
            self.embedding_dim,
            int(config.hyper("attn_layer_num", config.hyper("att_layer_num", 3))),
            int(config.hyper("attn_dim", config.hyper("att_dim", 8))),
            int(config.hyper("num_heads", 2)),
        )
