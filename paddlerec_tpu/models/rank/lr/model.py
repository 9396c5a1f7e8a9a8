"""Logistic regression over sparse one-hot features.

Parity target: reference models/rank/logistic_regression/net.py — a rank-1
weight per sparse id plus bias (optionally dense weights), sigmoid output.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.layers import FMFirstOrder


class LRNet(nn.Module):
    vocab_size: int
    use_dense: bool = True

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray = None):
        return FMFirstOrder(self.vocab_size)(
            sparse_ids, dense if self.use_dense else None
        )


@register_model("rank.lr")
@register_model("rank.logistic_regression")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = LRNet(self.vocab_size, use_dense=self.dense_dim > 0)
