"""DCN: CrossNet (v1) + DNN in parallel, concat → logit.

Parity target: reference models/rank/dcn/net.py — cross_num cross layers
over [embeddings, dense], DNN branch, concatenated head; l2 regularization
on cross weights (l2_reg_cross) and global-norm gradient clipping
(clip_by_norm) from config.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.ops.layers import MLP, CrossNet


class DCNNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    fc_sizes: Sequence[int]
    cross_num: int = 2
    dnn_use_bn: bool = False

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        emb = SlotEmbedding(self.vocab_size, self.embedding_dim, name="embedding")(
            sparse_ids
        )
        b = emb.shape[0]
        x0 = jnp.concatenate([emb.reshape(b, -1), dense], axis=-1)
        cross_out, cross_l2 = CrossNet(
            self.cross_num, share_weights=True, return_l2=True,
            name="crossnet",
        )(x0)
        self.sow("intermediates", "cross_l2", cross_l2)
        deep_out = MLP(list(self.fc_sizes), name="tower")(x0)
        final = jnp.concatenate([cross_out, deep_out], axis=-1)
        return nn.Dense(1, name="head")(final)[:, 0]


@register_model("rank.dcn")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = DCNNet(
            self.vocab_size,
            self.embedding_dim,
            config.hyper("fc_sizes", [512, 256, 128]),
            int(config.hyper("cross_num", 2)),
            bool(config.hyper("dnn_use_bn", False)),
        )
        self.l2_reg_cross = float(config.hyper("l2_reg_cross", 0.0))

    def train_forward(self, params, batch):
        # reference l2_reg_cross penalizes Σ||x ⊙ w||² over layers (the
        # per-batch product, net.py:117-138), not the raw weight vectors
        logits, inter = self.module.apply(
            {"params": params}, *self.model_inputs(batch),
            mutable=["intermediates"],
        )
        import jax as _jax

        from paddlerec_tpu.models.base import binary_logloss

        logits = logits.reshape(-1)
        labels = batch["label"].reshape(-1).astype(jnp.float32)
        mask = batch.get("mask")
        loss = binary_logloss(logits, labels, mask)
        if self.l2_reg_cross:
            (cross_l2,) = inter["intermediates"]["cross_l2"]
            loss = loss + self.l2_reg_cross * cross_l2
        aux = {"predictions": _jax.nn.sigmoid(logits), "labels": labels}
        if mask is not None:
            aux["mask"] = mask
        return loss, aux
