"""GateNet (GateDnn): embedding gates + hidden gates over a DNN.

Parity target: reference models/rank/gatenet/net.py — per-field scalar
embedding-gate weight (emb·w → sigmoid → scale emb) and per-layer hidden
gate (tanh(h W_g), reference net.py:116 uses tanh for the
hidden gate; the embedding gate stays sigmoid).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import CTRModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding


class GateNet(nn.Module):
    vocab_size: int
    embedding_dim: int
    fc_sizes: Sequence[int]
    use_embedding_gate: bool = True
    use_hidden_gate: bool = True

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray):
        emb = SlotEmbedding(self.vocab_size, self.embedding_dim, name="embedding")(
            sparse_ids
        )  # (B, S, E)
        s = emb.shape[1]
        if self.use_embedding_gate:
            gate_w = self.param(
                "embedding_gate_weight", nn.initializers.normal(1.0), (s, 1)
            )
            gate = nn.sigmoid((emb * gate_w).sum(axis=-1, keepdims=True))
            emb = emb * gate
        b = emb.shape[0]
        x = jnp.concatenate([emb.reshape(b, -1), dense], axis=-1)
        for i, size in enumerate(self.fc_sizes):
            fan_in = x.shape[-1]
            x = nn.Dense(
                size,
                kernel_init=nn.initializers.normal(1.0 / jnp.sqrt(fan_in)),
                name=f"fc_{i}",
            )(x)
            x = nn.relu(x)
            if self.use_hidden_gate:
                g = self.param(
                    f"hidden_gate_weight_{i}",
                    nn.initializers.normal(1.0 / jnp.sqrt(size)),
                    (size, size),
                )
                x = x * jnp.tanh(x @ g)  # reference: tanh hidden gate
        return nn.Dense(
            1,
            kernel_init=nn.initializers.normal(1.0 / jnp.sqrt(x.shape[-1])),
            name="last_layer",
        )(x)[:, 0]


@register_model("rank.gatenet")
class ModelDef(CTRModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = GateNet(
            self.vocab_size,
            self.embedding_dim,
            config.hyper("fc_sizes", [512, 256, 128, 32]),
            bool(config.hyper("use_embedding_gate", True)),
            bool(config.hyper("use_hidden_gate", True)),
        )
