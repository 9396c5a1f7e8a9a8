"""DPIN: Deep Position-wise Interaction Network (position-bias CTR).

Parity target: reference models/rank/dpin/net.py:18-253 —
  * base module: item+context embedding → MLP 1024-512-128;
  * position-wise interest aggregation: per position k, the user's
    history at that position (K positions × L behaviors) is pooled by a
    learned exp-weighting (net.py:240-253);
  * position-wise non-linear interaction + a 12-layer transformer over
    the K position slots (d_model 64, 2 heads);
  * combination: per-position sigmoid CTR from [item MLP ‖ transformer
    output ‖ position embedding].

Output is (B, K) — the CTR of the candidate at each display position.
Loss: BCE against the position-expanded click label.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.data.slot_reader import list_data_files, shard_files
from paddlerec_tpu.models.base import Aux, ModelDef
from paddlerec_tpu.ops.sequence import TransformerBlock


class DPINNet(nn.Module):
    K: int
    emb_dim: int
    max_item: int
    max_context: int
    d_model: int = 64
    num_heads: int = 2
    num_blocks: int = 12

    @nn.compact
    def __call__(self, hist_item, hist_cat, target_item, target_cat, position):
        e = self.emb_dim
        item_emb = nn.Embed(self.max_item, e, name="item_feat_emb")
        ctx_emb = nn.Embed(self.max_context, e, name="context_feat_emb")

        # base module (net.py:127-137)
        base_in = jnp.concatenate(
            [ctx_emb(target_cat), item_emb(target_item)], -1
        )
        h = base_in
        for i, d in enumerate((1024, 512, 128)):
            h = nn.relu(nn.Dense(d, name=f"base_{i}")(h))  # (B, 128)

        # position-wise interest aggregation (net.py:240-253)
        bx_item = nn.Embed(self.max_item, e, name="user_bx_item_emb")(hist_item)
        bx_ctx = nn.Embed(self.max_context, e, name="user_bx_context_emb")(
            hist_cat
        )
        user_bx = jnp.concatenate([bx_item, bx_ctx], -1)  # (B, K, L, 2E)
        w = nn.Dense(2 * e, name="agg_fc2")(
            nn.relu(nn.Dense(2 * e, name="agg_fc1")(user_bx))
        )
        w = jnp.exp(w)
        interest = (user_bx * w).sum(2) / jnp.maximum(w.sum(2), 1e-9)

        pos_emb = nn.Embed(self.K, e, name="position_emb")(position)
        x = nn.relu(
            nn.Dense(self.d_model, name="non_linear")(
                jnp.concatenate([pos_emb, interest], -1)
            )
        )  # (B, K, d_model)
        ones = jnp.ones(x.shape[:2], x.dtype)
        for i in range(self.num_blocks):
            x = TransformerBlock(
                self.num_heads, self.d_model // self.num_heads, self.d_model,
                name=f"transformer_{i}",
            )(x, ones)

        pos_emb2 = nn.Embed(self.K, e, name="position_emb_2")(position)
        item_rep = jnp.broadcast_to(
            h[:, None, :], (h.shape[0], self.K, h.shape[-1])
        )
        comb = jnp.concatenate([item_rep, x, pos_emb2], -1)
        logits = nn.Dense(1, name="comb_out")(
            nn.relu(nn.Dense(128, name="comb_fc")(comb))
        )[..., 0]
        return logits  # (B, K)


@register_model("rank.dpin")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        self.K = int(config.hyper("K", 10))
        self.L = int(config.hyper("L", 10))
        self.max_item = int(config.hyper("max_item", 100000))
        self.max_context = int(config.hyper("max_context", 100000))
        self.module = DPINNet(
            self.K,
            int(config.hyper("emb_dim", 32)),
            self.max_item,
            self.max_context,
            int(config.hyper("d_model", 64)),
            int(config.hyper("h", 2)),
            int(config.hyper("num_blocks", 12)),
        )

    def model_inputs(self, batch):
        return (
            batch["hist_item"], batch["hist_cat"], batch["target_item"],
            batch["target_cat"], batch["position"],
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        K, L = self.K, self.L
        return {
            "hist_item": rng.randint(0, self.max_item, (batch_size, K, L)
                                     ).astype(np.int64),
            "hist_cat": rng.randint(0, self.max_context, (batch_size, K, L)
                                    ).astype(np.int64),
            "target_item": rng.randint(0, self.max_item, batch_size
                                       ).astype(np.int64),
            "target_cat": rng.randint(0, self.max_context, batch_size
                                      ).astype(np.int64),
            "position": np.tile(np.arange(K, dtype=np.int64), (batch_size, 1)),
            "label": (rng.rand(batch_size, K) < 0.3).astype(np.float32),
        }

    def train_forward(self, params, batch):
        logits = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        labels = batch["label"].astype(jnp.float32)
        import optax

        loss = optax.sigmoid_binary_cross_entropy(logits, labels).mean()
        aux: Aux = {
            "predictions": jax.nn.sigmoid(logits).reshape(-1),
            "labels": labels.reshape(-1),
        }
        return loss, aux

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return DPINDataset(files, batch_size, self.K, self.L)


class DPINDataset:
    """Lines: ``target_item,target_cat;K·L hist items;K·L hist cats;
    K labels`` (semicolon-separated groups, comma-separated ints)."""

    def __init__(self, files, batch_size, K, L):
        self.files = files
        self.batch_size = batch_size
        self.K, self.L = K, L

    def __iter__(self):
        K, L, bs = self.K, self.L, self.batch_size
        buf = []
        for path in self.files:
            with open(path) as f:
                for line in f:
                    parts = line.strip().split(";")
                    if len(parts) < 4:
                        continue
                    buf.append(parts)
                    if len(buf) == bs:
                        yield self._batch(buf)
                        buf = []
        if buf:
            yield self._batch(buf)

    def _batch(self, rows):
        K, L = self.K, self.L
        n = len(rows)
        out = {
            "hist_item": np.zeros((n, K, L), np.int64),
            "hist_cat": np.zeros((n, K, L), np.int64),
            "target_item": np.zeros((n,), np.int64),
            "target_cat": np.zeros((n,), np.int64),
            "position": np.tile(np.arange(K, dtype=np.int64), (n, 1)),
            "label": np.zeros((n, K), np.float32),
        }
        for i, p in enumerate(rows):
            ti, tc = p[0].split(",")
            out["target_item"][i], out["target_cat"][i] = int(ti), int(tc)
            out["hist_item"][i] = np.asarray(
                [int(v) for v in p[1].split(",")][: K * L]
            ).reshape(K, L)
            out["hist_cat"][i] = np.asarray(
                [int(v) for v in p[2].split(",")][: K * L]
            ).reshape(K, L)
            out["label"][i] = [float(v) for v in p[3].split(",")][:K]
        return out
