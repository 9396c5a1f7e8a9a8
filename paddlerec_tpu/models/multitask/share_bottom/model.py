"""Share-bottom multitask: shared bottom MLP + per-task towers.

Parity target: reference models/multitask/share_bottom/net.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.multitask.base import DenseMultitaskModelDef


class ShareBottomNet(nn.Module):
    feature_size: int
    bottom_size: int = 117
    tower_size: int = 8
    task_num: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bottom = nn.relu(nn.Dense(self.bottom_size, name="bottom")(x))
        outs = []
        for t in range(self.task_num):
            h = nn.relu(nn.Dense(self.tower_size, name=f"tower_{t}")(bottom))
            outs.append(nn.sigmoid(nn.Dense(1, name=f"head_{t}")(h))[:, 0])
        return jnp.stack(outs, axis=-1)


@register_model("multitask.share_bottom")
class ModelDef(DenseMultitaskModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = ShareBottomNet(
            self.feature_size,
            int(config.hyper("bottom_size", 117)),
            int(config.hyper("tower_size", 8)),
            int(config.hyper("task_num", 2)),
        )
