"""AITM: adaptive information transfer multitask (click → purchase funnel).

Parity target: reference models/multitask/aitm/net.py — click & conversion
towers over shared embeddings; the conversion head attends over
[transferred click info, conversion tower output]; behavioral-expectation
constraint loss max(p_purchase − p_click, 0) weighted by ``constraint_weight``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.multitask.base import AliCCPModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP


class AITMNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    num_field: int
    tower_dims: Sequence[int] = (128, 64, 32)

    @nn.compact
    def __call__(self, sparse_ids, sparse_mask=None):
        emb = SlotEmbedding(
            self.vocab_size, self.embedding_dim, combiner="sum", name="embedding"
        )(sparse_ids, sparse_mask)
        b = emb.shape[0]
        feat = emb.reshape(b, -1)
        t_click = MLP(list(self.tower_dims), name="click_tower",
                      output_activation="relu")(feat)
        t_conv = MLP(list(self.tower_dims), name="conversion_tower",
                     output_activation="relu")(feat)
        dim = self.tower_dims[-1]
        # info transfer: attention over [transferred click info, conv tower]
        info = nn.relu(nn.Dense(dim, name="info")(t_click))
        stack = jnp.stack([t_conv, info], axis=1)  # (B, 2, D)
        q = nn.Dense(dim, use_bias=False, name="att_q")(stack)
        k = nn.Dense(dim, use_bias=False, name="att_k")(stack)
        v = nn.Dense(dim, use_bias=False, name="att_v")(stack)
        a = nn.softmax((q * k).sum(-1) / jnp.sqrt(dim), axis=1)  # (B, 2)
        fused = (a[..., None] * v).sum(axis=1)  # (B, D)
        click_prob = nn.sigmoid(nn.Dense(1, name="click_head")(t_click))[:, 0]
        conv_prob = nn.sigmoid(nn.Dense(1, name="conv_head")(fused))[:, 0]
        return click_prob, conv_prob


@register_model("multitask.aitm")
class ModelDef(AliCCPModelDef):
    metric_names = ("ctr", "ctcvr")

    def __init__(self, config):
        super().__init__(config)
        self.constraint_weight = float(config.hyper("constraint_weight", 0.6))
        self.module = AITMNet(
            self.vocab_size,
            self.embedding_dim,
            self.num_field,
            config.hyper("tower_dims", [128, 64, 32]),
        )

    def train_forward(self, params, batch):
        # AITM predicts purchase directly (not ctr×cvr); reuse the entire-
        # space bookkeeping but add the funnel constraint.
        click_prob, conv_prob = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        click_prob = jnp.clip(click_prob, 1e-7, 1 - 1e-7)
        conv_prob = jnp.clip(conv_prob, 1e-7, 1 - 1e-7)
        click = batch["labels"][:, 0]
        conversion = batch["labels"][:, 1]
        mask = batch.get("mask")

        def bce(p, y):
            per = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
            if mask is not None:
                return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)
            return per.mean()

        constraint = jnp.maximum(conv_prob - click_prob, 0.0)
        # the reference SUMS the constraint (dygraph_model.py:50) while
        # averaging the BCE terms — averaging here made the funnel
        # regularizer batch_size× weaker than parity
        if mask is not None:
            constraint = (constraint * mask).sum()
        else:
            constraint = constraint.sum()
        loss = bce(click_prob, click) + bce(conv_prob, conversion) \
            + self.constraint_weight * constraint
        aux = {
            "ctr": click_prob,
            "ctcvr": conv_prob,
            "click": click,
            "conversion": conversion,
        }
        if mask is not None:
            aux["mask"] = mask
        return loss, aux
