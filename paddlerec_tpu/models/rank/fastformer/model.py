"""Fastformer news recommender: NAML with additive-attention transformers.

Parity target: reference models/rank/fastformer/net.py + fastformer.py —
the NAML multi-view news encoder where the title/content attention pooling
is replaced by a **Fastformer** encoder (Wu et al. 2021): linear-time
additive attention — per head, a softmax over query scores pools a global
query; element-wise query·key products are pooled the same way into a
global key; values (=queries) are modulated and residually transformed
(fastformer.py:96-155), followed by a position-embedding input layer and
an attention-pooling readout (fastformer.py:224-313).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.rank.naml.model import (
    AdditiveAttention,
    NewsRecModelDef,
)


class FastSelfAttention(nn.Module):
    """Additive-attention token mixing (fastformer.py:54-155)."""

    hidden_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask):  # x (B, T, D), mask (B, T)
        b, t, d = x.shape
        h = self.num_heads
        hd = self.hidden_size // h
        q = nn.Dense(self.hidden_size, name="query")(x)
        k = nn.Dense(self.hidden_size, name="key")(x)
        neg = (1.0 - mask) * -1e4

        # global query: per-head softmax over positions
        q_score = (
            nn.Dense(h, name="query_att")(q).transpose(0, 2, 1) / hd**0.5
            + neg[:, None, :]
        )  # (B, H, T)
        q_w = jax.nn.softmax(q_score, -1)
        q_heads = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)  # (B,H,T,hd)
        pooled_q = jnp.einsum("bht,bhtd->bhd", q_w, q_heads)
        pooled_q_full = pooled_q.transpose(0, 1, 2).reshape(b, 1, d)

        # key modulated by the global query, pooled the same way
        qk = k * pooled_q_full
        k_score = (
            nn.Dense(h, name="key_att")(qk).transpose(0, 2, 1) / hd**0.5
            + neg[:, None, :]
        )
        k_w = jax.nn.softmax(k_score, -1)
        k_heads = qk.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        pooled_k = jnp.einsum("bht,bhtd->bhd", k_w, k_heads)  # (B, H, hd)

        weighted = (pooled_k[:, :, None, :] * q_heads).transpose(0, 2, 1, 3)
        weighted = weighted.reshape(b, t, d)
        return nn.Dense(d, name="transform")(weighted) + q


class FastformerLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int

    @nn.compact
    def __call__(self, x, mask):
        att = FastSelfAttention(
            self.hidden_size, self.num_heads, name="self_attention"
        )(x, mask)
        att = nn.Dense(self.hidden_size, name="att_dense")(att)
        x = nn.LayerNorm(epsilon=1e-12, name="att_ln")(att + x)
        inter = nn.gelu(nn.Dense(self.intermediate_size, name="inter")(x))
        out = nn.Dense(self.hidden_size, name="out")(inter)
        return nn.LayerNorm(epsilon=1e-12, name="out_ln")(out + x)


class FastformerEncoder(nn.Module):
    """Position embeddings + N layers + attention-pool readout
    (fastformer.py:224-313)."""

    hidden_size: int
    num_heads: int
    num_layers: int
    intermediate_size: int
    max_position: int = 256

    @nn.compact
    def __call__(self, x, mask):  # (B, T, D) → (B, D)
        b, t, d = x.shape
        pos = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
        x = x + nn.Embed(self.max_position, d, name="position_emb")(pos)
        x = nn.LayerNorm(epsilon=1e-12, name="input_ln")(x)
        for i in range(self.num_layers):
            x = FastformerLayer(
                self.hidden_size, self.num_heads, self.intermediate_size,
                name=f"layer_{i}",
            )(x, mask)
        # attention pooling readout (AttentionPooling, net.py:23-44)
        score = nn.Dense(1, name="pool_att")(
            jnp.tanh(nn.Dense(d, name="pool_fc")(x))
        )[..., 0]
        score = score + (1.0 - mask) * -1e4
        w = jax.nn.softmax(score, -1)
        return jnp.einsum("bt,btd->bd", w, x)


class FastformerNewsEncoder(nn.Module):
    word_dict_size: int
    word_dim: int
    category_size: int
    sub_category_size: int
    cate_dim: int
    conv_out: int
    num_heads: int
    num_layers: int
    intermediate_size: int

    @nn.compact
    def __call__(self, category, sub_category, title, content):
        word_emb = nn.Embed(
            self.word_dict_size + 1, self.word_dim, name="word2vec_embedding"
        )
        cate_v = nn.relu(
            nn.Dense(self.conv_out, name="category_linear")(
                nn.Embed(self.category_size + 1, self.cate_dim,
                         name="cate_embedding")(category)
            )
        )
        sub_v = nn.relu(
            nn.Dense(self.conv_out, name="sub_category_linear")(
                nn.Embed(self.sub_category_size + 1, self.cate_dim,
                         name="sub_cate_embedding")(sub_category)
            )
        )
        conv = nn.Conv(self.conv_out, (3,), padding="SAME", name="conv_title")
        # pad token = word_dict_size (create_mask, net.py:199-205)
        tmask = (title != self.word_dict_size).astype(jnp.float32)
        cmask = (content != self.word_dict_size).astype(jnp.float32)
        title_v = FastformerEncoder(
            self.conv_out, self.num_heads, self.num_layers,
            self.intermediate_size, name="title_attention",
        )(nn.relu(conv(word_emb(title))), tmask)
        content_v = FastformerEncoder(
            self.conv_out, self.num_heads, self.num_layers,
            self.intermediate_size, name="content_attention",
        )(nn.relu(conv(word_emb(content))), cmask)
        views = jnp.stack([title_v, content_v, cate_v, sub_v], axis=1)
        return AdditiveAttention(name="mix_attention")(views)


class FastRecommenderNet(nn.Module):
    word_dict_size: int
    word_dim: int
    category_size: int
    sub_category_size: int
    cate_dim: int
    sample_size: int
    browse_size: int
    num_heads: int = 16
    num_layers: int = 2
    intermediate_size: int = 256
    conv_out: int = 400

    @nn.compact
    def __call__(
        self, cate_sample, cate_visit, sub_cate_sample, sub_cate_visit,
        title_sample, title_visit, content_sample, content_visit,
    ):
        cate = jnp.concatenate([cate_sample, cate_visit], 1)
        sub = jnp.concatenate([sub_cate_sample, sub_cate_visit], 1)
        title = jnp.concatenate([title_sample, title_visit], 1)
        content = jnp.concatenate([content_sample, content_visit], 1)
        b, g = cate.shape
        vecs = FastformerNewsEncoder(
            self.word_dict_size, self.word_dim, self.category_size,
            self.sub_category_size, self.cate_dim, self.conv_out,
            self.num_heads, self.num_layers, self.intermediate_size,
            name="news_encoder",
        )(
            cate.reshape(-1), sub.reshape(-1),
            title.reshape(b * g, -1), content.reshape(b * g, -1),
        ).reshape(b, g, self.conv_out)
        sample_emb = vecs[:, : self.sample_size]
        visit_emb = vecs[:, self.sample_size:]
        # user tower: Fastformer layers over the browsed-news sequence
        # (reference net.py:300-441 UserEncoder) — pooling alone dropped
        # the token mixing the model family is named for
        t = visit_emb.shape[1]
        pos = self.param(
            "user_pos_emb", nn.initializers.normal(0.02),
            (1, t, self.conv_out),
        )
        u = visit_emb + pos
        ones = jnp.ones(u.shape[:2], u.dtype)
        for i in range(self.num_layers):
            u = FastSelfAttention(
                self.conv_out, self.num_heads,
                name=f"user_layer_{i}",
            )(u, ones)
        user = AdditiveAttention(name="user_attention")(u)
        return jnp.einsum("bsd,bd->bs", sample_emb, user)


@register_model("rank.fastformer")
class ModelDef(NewsRecModelDef):
    def __init__(self, config: Config):
        super().__init__(config)
        h = config.hyper
        self.module = FastRecommenderNet(
            self.word_dict_size, self.word_dim, self.category_size,
            self.sub_category_size, self.cate_dim, self.neg_size + 1,
            self.browse_size,
            int(h("num_attention_heads", 16)),
            int(h("num_hidden_layers", 2)),
            int(h("intermediate_size", 256)),
        )
