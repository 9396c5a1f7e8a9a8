"""ESCM²: entire-space counterfactual multitask (CTR / CVR / CTCVR).

Parity target: reference models/multitask/escm2/net.py (MMoE backbone with
2 or 3 gated towers, softmax-2 heads) and the counterfactual losses of
models/multitask/escm2/dygraph_model.py — IPW (inverse propensity weighting,
clipped, click-masked) or DR (doubly robust with an imputation tower).
Loss = BCE(ctr) + w_cf · L_cvr + w_global · BCE(ctcvr).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.multitask.base import AliCCPModelDef
from paddlerec_tpu.ops.embedding import SlotEmbedding
from paddlerec_tpu.models.base import Aux


class ESCMNet(nn.Module):
    """MMoE over sum-pooled field embeddings; one softmax-2 tower per gate
    (reference ESCMLayer.forward, net.py:107-161)."""

    vocab_size: int
    embedding_dim: int
    expert_num: int
    expert_size: int
    tower_size: int
    gate_num: int  # 2 (IPW) or 3 (DR adds the imputation tower)

    @nn.compact
    def __call__(self, sparse_ids, sparse_mask=None):
        emb = SlotEmbedding(
            self.vocab_size, self.embedding_dim, combiner="sum", name="embedding"
        )(sparse_ids, sparse_mask)  # (B, F, E)
        feat = emb.reshape(emb.shape[0], -1)
        experts = jnp.stack(
            [
                nn.relu(nn.Dense(self.expert_size, name=f"expert_{i}")(feat))
                for i in range(self.expert_num)
            ],
            axis=1,
        )  # (B, N, S)
        probs = []
        for i in range(self.gate_num):
            gate = nn.softmax(nn.Dense(self.expert_num, name=f"gate_{i}")(feat))
            mixed = jnp.einsum("bns,bn->bs", experts, gate)
            tower = nn.relu(nn.Dense(self.tower_size, name=f"tower_{i}")(mixed))
            out = nn.softmax(nn.Dense(2, name=f"tower_out_{i}")(tower))
            probs.append(jnp.clip(out[:, 1], 1e-7, 1 - 1e-7))
        return tuple(probs)


@register_model("multitask.escm2")
class ModelDef(AliCCPModelDef):
    metric_names = ("ctr", "cvr", "ctcvr")

    def __init__(self, config):
        super().__init__(config)
        self.counterfact_mode = str(
            config.runner("counterfact_mode", "IPW") or "IPW"
        )
        self.global_w = float(config.hyper("global_w", 0.5))
        self.counterfactual_w = float(config.hyper("counterfactual_w", 0.5))
        self.module = ESCMNet(
            self.vocab_size,
            self.embedding_dim,
            int(config.hyper("expert_num", 8)),
            int(config.hyper("expert_size", 16)),
            int(config.hyper("tower_size", 8)),
            3 if self.counterfact_mode == "DR" else 2,
        )

    def train_forward(self, params, batch):
        outs = self.module.apply({"params": params}, *self.model_inputs(batch))
        ctr_prob, cvr_prob = outs[0], outs[1]
        ctcvr_prob = jnp.clip(ctr_prob * cvr_prob, 1e-7, 1 - 1e-7)
        click = batch["labels"][:, 0]
        conversion = batch["labels"][:, 1]
        mask = batch.get("mask")
        w = mask if mask is not None else jnp.ones_like(click)
        n = jnp.maximum(w.sum(), 1.0)

        def bce_per(p, y):
            return -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))

        loss_ctr = (bce_per(ctr_prob, click) * w).sum() / n
        loss_ctcvr = (bce_per(ctcvr_prob, conversion) * w).sum() / n
        loss_cvr_per = bce_per(cvr_prob, conversion)

        if self.counterfact_mode == "DR":
            # doubly robust (dygraph_model.counterfact_dr): error tower
            # imputes the CVR loss; IPS corrects on clicked examples.
            imp = outs[2]
            e = loss_cvr_per - imp
            ips = jax.lax.stop_gradient(
                jnp.clip(click / jnp.maximum(ctr_prob, 1e-6), -15, 15)
            )
            loss_error = imp + e * ips
            loss_imp = (e * e) * ips
            loss_cvr = ((loss_error + loss_imp) * w).sum() / n
        else:
            # inverse propensity weighting (dygraph_model.counterfact_ipw):
            # weight clicked examples by batch_size / (pCTR · #clicks).
            ctr_num = jnp.sum(click * w)
            ps = jnp.maximum(ctr_prob * ctr_num, 1e-6)
            ips = jax.lax.stop_gradient(jnp.clip(1.0 / ps, -15, 15) * n)
            loss_cvr = (loss_cvr_per * ips * click * w).sum() / n
        loss = (
            loss_ctr
            + self.counterfactual_w * loss_cvr
            + self.global_w * loss_ctcvr
        )
        aux: Aux = {
            "ctr": ctr_prob,
            "cvr": cvr_prob,
            "ctcvr": ctcvr_prob,
            "click": click,
            "conversion": conversion,
        }
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def metric_updates(self, aux):
        mask = aux.get("mask")
        # cvr AUC is measured against the conversion label on the entire
        # space, matching the reference's metric wiring
        # (escm2/dygraph_model.py:163-170).
        return {
            "ctr": (aux["ctr"], aux["click"], mask),
            "cvr": (aux["cvr"], aux["conversion"], mask),
            "ctcvr": (aux["ctcvr"], aux["conversion"], mask),
        }
