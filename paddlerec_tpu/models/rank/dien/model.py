"""DIEN: deep interest evolution network.

Parity target: reference models/rank/dien/net.py — interest extraction GRU
over behavior embeddings, target-attention scores over GRU states, AUGRU
interest evolution, final MLP over [evolved interest, target, pooled
history].  (The auxiliary next-click loss of the paper is off by default in
the reference config and is omitted here.)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.rank.din.model import ModelDef as DINModelDef
from paddlerec_tpu.ops.layers import MLP
from paddlerec_tpu.ops.sequence import AUGRU, GRU


class DIENNet(nn.Module):
    item_count: int
    cat_count: int
    item_emb_size: int = 64
    cat_emb_size: int = 64
    gru_hidden: int = 128
    attention_sizes: tuple = (80, 40)
    fc_sizes: tuple = (200, 80)

    @nn.compact
    def __call__(self, hist_item, hist_cat, target_item, target_cat, seq_mask):
        item_emb = nn.Embed(self.item_count, self.item_emb_size, name="item_emb")
        cat_emb = nn.Embed(self.cat_count, self.cat_emb_size, name="cat_emb")
        hist = jnp.concatenate([item_emb(hist_item), cat_emb(hist_cat)], -1)
        target = jnp.concatenate(
            [item_emb(target_item), cat_emb(target_cat)], -1
        )

        # interest extraction
        states, _ = GRU(self.gru_hidden, name="extract_gru")(hist, seq_mask)

        # target attention over extracted interests
        tgt = nn.Dense(self.gru_hidden, name="target_proj")(target)
        t_seq = jnp.broadcast_to(tgt[:, None, :], states.shape)
        att_in = jnp.concatenate(
            [states, t_seq, states - t_seq, states * t_seq], axis=-1
        )
        scores = MLP(
            list(self.attention_sizes) + [1],
            activation="sigmoid",
            output_activation="none",
            name="attention",
        )(att_in)[..., 0]
        scores = jnp.where(seq_mask > 0, scores, -1e9)
        att = jax.nn.softmax(scores, axis=-1)

        # interest evolution
        _, final = AUGRU(self.gru_hidden, name="evolve_augru")(
            states, att, seq_mask
        )

        pooled = (hist * seq_mask[..., None]).sum(1) / jnp.maximum(
            seq_mask.sum(1, keepdims=True), 1.0
        )
        feat = jnp.concatenate([final, target, pooled, final * tgt], axis=-1)
        hidden = MLP(
            list(self.fc_sizes),
            activation="sigmoid",
            output_activation="sigmoid",
            name="tower",
        )(feat)
        return nn.Dense(1, name="head")(hidden)[:, 0]


@register_model("rank.dien")
class ModelDef(DINModelDef):
    def __init__(self, config: Config):
        # skip DIN's module construction; reuse its data plumbing
        super(DINModelDef, self).__init__(config)
        self.item_count = int(config.hyper("item_count", 63001))
        self.cat_count = int(config.hyper("cat_count", 801))
        self.max_seq_len = int(config.hyper("max_seq_len", 64))
        self.module = DIENNet(
            self.item_count,
            self.cat_count,
            int(config.hyper("item_emb_size", 64)),
            int(config.hyper("cat_emb_size", 64)),
            int(config.hyper("gru_hidden", 128)),
            tuple(config.hyper("attention_sizes", [80, 40])),
            tuple(config.hyper("fc_sizes", [200, 80])),
        )

    def touched_tables(self, batch):
        # DIN's hook minus item_b (DIEN's net has no item-bias table)
        out = super().touched_tables(batch)
        out.pop("item_b/embedding", None)
        return out
