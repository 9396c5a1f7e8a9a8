"""DIN: deep interest network — target attention over behavior history.

Parity target: reference models/rank/din/net.py:139-184 — item + category
embeddings for history and target, attention scores from
MLP(concat[h, t, h−t, h·t]) softmaxed over the (masked) sequence, pooled
history combined with the target through a sigmoid-act tower, plus a
per-item bias.

TPU note: the reference buckets batches by length (dinReader.py group
sort); here sequences are padded to a static ``max_seq_len`` so one
compiled program serves every batch.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.data.slot_reader import list_data_files, shard_files
from paddlerec_tpu.models.base import Aux, ModelDef, binary_logloss
from paddlerec_tpu.ops.layers import MLP, TargetAttention


class DINNet(nn.Module):
    item_count: int
    cat_count: int
    item_emb_size: int = 64
    cat_emb_size: int = 64
    attention_sizes: tuple = (80, 40)
    fc_sizes: tuple = (80, 40)

    @nn.compact
    def __call__(self, hist_item, hist_cat, target_item, target_cat, seq_mask):
        item_emb = nn.Embed(self.item_count, self.item_emb_size, name="item_emb")
        cat_emb = nn.Embed(self.cat_count, self.cat_emb_size, name="cat_emb")
        item_b = nn.Embed(
            self.item_count, 1,
            embedding_init=nn.initializers.zeros, name="item_b",
        )

        hist = jnp.concatenate(
            [item_emb(hist_item), cat_emb(hist_cat)], axis=-1
        )  # (B, T, 2E)
        target = jnp.concatenate(
            [item_emb(target_item), cat_emb(target_cat)], axis=-1
        )  # (B, 2E)
        dim = hist.shape[-1]

        # shared DIN-style attention (ops/layers.py TargetAttention —
        # the inline copy drifted from the layer DSIN uses)
        pooled = TargetAttention(
            hidden_sizes=tuple(self.attention_sizes),
            scale_scores=True,
            name="attention",
        )(hist, target, seq_mask)  # (B, 2E)

        h = nn.Dense(dim, name="proj")(pooled)
        feat = jnp.concatenate([h, target], axis=-1)
        out = MLP(
            list(self.fc_sizes) + [1],
            activation="sigmoid",
            output_activation="none",
            name="tower",
        )(feat)[:, 0]
        return out + item_b(target_item)[:, 0]


@register_model("rank.din")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        self.item_count = int(config.hyper("item_count", 63001))
        self.cat_count = int(config.hyper("cat_count", 801))
        self.max_seq_len = int(config.hyper("max_seq_len", 128))
        self.module = DINNet(
            self.item_count,
            self.cat_count,
            int(config.hyper("item_emb_size", 64)),
            int(config.hyper("cat_emb_size", 64)),
            tuple(config.hyper("attention_sizes", [80, 40])),
            tuple(config.hyper("fc_sizes", [80, 40])),
        )

    def model_inputs(self, batch):
        return (
            batch["hist_item"],
            batch["hist_cat"],
            batch["target_item"],
            batch["target_cat"],
            batch["seq_mask"],
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        t = self.max_seq_len
        lens = rng.randint(1, t + 1, batch_size)
        seq_mask = (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
        return {
            "hist_item": (rng.randint(0, self.item_count, (batch_size, t))
                          * seq_mask).astype(np.int32),
            "hist_cat": (rng.randint(0, self.cat_count, (batch_size, t))
                         * seq_mask).astype(np.int32),
            "target_item": rng.randint(0, self.item_count, batch_size).astype(
                np.int32
            ),
            "target_cat": rng.randint(0, self.cat_count, batch_size).astype(
                np.int32
            ),
            "seq_mask": seq_mask,
            "label": (rng.rand(batch_size) < 0.5).astype(np.float32),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        logits = self.module.apply({"params": params}, *self.model_inputs(batch))
        labels = batch["label"].reshape(-1).astype(jnp.float32)
        mask = batch.get("mask")
        loss = binary_logloss(logits, labels, mask)
        aux: Aux = {"predictions": jax.nn.sigmoid(logits), "labels": labels}
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def touched_tables(self, batch):
        """Exact per-table row bookkeeping for delta publishing: the item
        and category tables have different row counts, so the fused-CTR
        default (first-table geometry) cannot cover them (VERDICT r2 W5).
        Padded history positions are filtered by seq_mask."""
        live = np.asarray(batch["seq_mask"]) > 0
        items = np.concatenate([
            np.asarray(batch["hist_item"])[live].ravel(),
            np.asarray(batch["target_item"]).ravel(),
        ])
        cats = np.concatenate([
            np.asarray(batch["hist_cat"])[live].ravel(),
            np.asarray(batch["target_cat"]).ravel(),
        ])
        return {
            "item_emb/embedding": items % self.item_count,
            "item_b/embedding": items % self.item_count,
            "cat_emb/embedding": cats % self.cat_count,
        }

    def make_dataset(self, data_dir: str, batch_size: int, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return DINDataset(files, self.max_seq_len, batch_size)


class DINDataset:
    """Amazon-format lines: ``hist_items;hist_cats;item;cat;label``
    (dinReader.py), padded/truncated to a static max_seq_len."""

    def __init__(self, files, max_seq_len, batch_size):
        self.files = files
        self.max_seq_len = max_seq_len
        self.batch_size = batch_size

    def __iter__(self):
        bs, t = self.batch_size, self.max_seq_len
        out = {
            "hist_item": np.zeros((bs, t), np.int32),
            "hist_cat": np.zeros((bs, t), np.int32),
            "target_item": np.zeros((bs,), np.int32),
            "target_cat": np.zeros((bs,), np.int32),
            "seq_mask": np.zeros((bs, t), np.float32),
            "label": np.zeros((bs,), np.float32),
        }
        row = 0
        for path in self.files:
            with open(path) as f:
                for line in f:
                    parts = line.strip().split(";")
                    if len(parts) < 5:
                        continue
                    hist = [int(x) for x in parts[0].split()][-t:]
                    cats = [int(x) for x in parts[1].split()][-t:]
                    n = min(len(hist), len(cats))
                    out["hist_item"][row, :n] = hist[:n]
                    out["hist_cat"][row, :n] = cats[:n]
                    out["seq_mask"][row, :n] = 1.0
                    out["target_item"][row] = int(parts[2])
                    out["target_cat"][row] = int(parts[3])
                    out["label"][row] = float(parts[4])
                    row += 1
                    if row == bs:
                        batch = {k: v.copy() for k, v in out.items()}
                        batch["mask"] = np.ones(bs, np.float32)
                        yield batch
                        for v in out.values():
                            v[:] = 0
                        row = 0
        if row:
            batch = {k: v.copy() for k, v in out.items()}
            mask = np.zeros(bs, np.float32)
            mask[:row] = 1.0
            batch["mask"] = mask
            yield batch
