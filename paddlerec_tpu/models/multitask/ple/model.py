"""PLE: progressive layered extraction (CGC layers).

Parity target: reference models/multitask/ple/net.py:20-177 — per-task
expert groups + shared experts per level; task gates mix own+shared
experts, the shared gate mixes everything; final per-task towers.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.multitask.base import DenseMultitaskModelDef


class CGCLayer(nn.Module):
    task_num: int
    exp_per_task: int
    shared_num: int
    expert_size: int
    is_last: bool

    @nn.compact
    def __call__(self, inputs):  # list of task_num+1 tensors (task..., shared)
        experts = []
        for t in range(self.task_num):
            experts.append(
                nn.relu(
                    nn.DenseGeneral(
                        (self.exp_per_task, self.expert_size),
                        name=f"task_exp_{t}",
                    )(inputs[t])
                )
            )  # (B, P, E)
        shared = nn.relu(
            nn.DenseGeneral(
                (self.shared_num, self.expert_size), name="shared_exp"
            )(inputs[-1])
        )  # (B, S, E)

        outs = []
        for t in range(self.task_num):
            pool = jnp.concatenate([experts[t], shared], axis=1)
            gate = nn.softmax(
                nn.Dense(pool.shape[1], name=f"gate_{t}")(inputs[t]), axis=-1
            )
            outs.append(jnp.einsum("bne,bn->be", pool, gate))
        if not self.is_last:
            pool = jnp.concatenate(experts + [shared], axis=1)
            gate = nn.softmax(
                nn.Dense(pool.shape[1], name="gate_shared")(inputs[-1]), axis=-1
            )
            outs.append(jnp.einsum("bne,bn->be", pool, gate))
        return outs


class PLENet(nn.Module):
    feature_size: int
    task_num: int = 2
    exp_per_task: int = 3
    shared_num: int = 1
    expert_size: int = 16
    tower_size: int = 8
    level_number: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inputs = [x] * (self.task_num + 1)
        for lvl in range(self.level_number):
            is_last = lvl == self.level_number - 1
            inputs = CGCLayer(
                self.task_num,
                self.exp_per_task,
                self.shared_num,
                self.expert_size,
                is_last,
                name=f"cgc_{lvl}",
            )(inputs)
        outs = []
        for t in range(self.task_num):
            h = nn.relu(nn.Dense(self.tower_size, name=f"tower_{t}")(inputs[t]))
            outs.append(nn.sigmoid(nn.Dense(1, name=f"head_{t}")(h))[:, 0])
        return jnp.stack(outs, axis=-1)


@register_model("multitask.ple")
class ModelDef(DenseMultitaskModelDef):
    def __init__(self, config):
        super().__init__(config)
        self.module = PLENet(
            self.feature_size,
            int(config.hyper("task_num", 2)),
            int(config.hyper("exp_per_task", 3)),
            int(config.hyper("shared_num", 1)),
            int(config.hyper("expert_size", 16)),
            int(config.hyper("tower_size", 8)),
            int(config.hyper("level_number", 1)),
        )
