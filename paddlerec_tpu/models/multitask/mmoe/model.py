"""MMoE: multi-gate mixture-of-experts over census features.

Parity target: reference models/multitask/mmoe/net.py:20-85 — expert_num
experts (feature→expert_size), one softmax gate per task, per-task towers,
2-way softmax heads (emitted here as p(class 1)).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.multitask.base import DenseMultitaskModelDef


class MMoENet(nn.Module):
    feature_size: int
    expert_num: int = 8
    expert_size: int = 16
    tower_size: int = 8
    gate_num: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, F) → (B, T)
        e = nn.relu(
            nn.DenseGeneral((self.expert_num, self.expert_size), name="experts")(x)
        )  # (B, N, E)
        outs = []
        for t in range(self.gate_num):
            gate = nn.softmax(
                nn.Dense(self.expert_num, name=f"gate_{t}")(x), axis=-1
            )  # (B, N)
            mixed = jnp.einsum("bne,bn->be", e, gate)
            h = nn.relu(nn.Dense(self.tower_size, name=f"tower_{t}")(mixed))
            outs.append(nn.sigmoid(nn.Dense(1, name=f"head_{t}")(h))[:, 0])
        return jnp.stack(outs, axis=-1)


@register_model("multitask.mmoe")
class ModelDef(DenseMultitaskModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = MMoENet(
            self.feature_size,
            int(config.hyper("expert_num", 8)),
            int(config.hyper("expert_size", 16)),
            int(config.hyper("tower_size", 8)),
            int(config.hyper("gate_num", 2)),
        )
