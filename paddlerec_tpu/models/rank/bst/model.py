"""BST: behavior-sequence transformer.

Parity target: reference models/rank/bst/net.py — item+cat(+position)
embeddings over the history, the target appended as the final sequence
element, multi-head self-attention transformer block(s), flattened output
through an MLP to one logit.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.rank.din.model import DINDataset
from paddlerec_tpu.models.base import Aux, ModelDef, binary_logloss
from paddlerec_tpu.ops.layers import MLP
from paddlerec_tpu.ops.sequence import TransformerBlock


class BSTNet(nn.Module):
    item_count: int
    cat_count: int
    item_emb_size: int = 64
    cat_emb_size: int = 64
    position_size: int = 256
    num_heads: int = 2
    num_blocks: int = 1
    ffn_dim: int = 128
    fc_sizes: tuple = (256, 128, 64)

    @nn.compact
    def __call__(self, hist_item, hist_cat, target_item, target_cat, seq_mask):
        item_emb = nn.Embed(self.item_count, self.item_emb_size, name="item_emb")
        cat_emb = nn.Embed(self.cat_count, self.cat_emb_size, name="cat_emb")
        b, t = hist_item.shape
        d = self.item_emb_size + self.cat_emb_size
        pos_emb = nn.Embed(self.position_size, d, name="pos_emb")

        hist = jnp.concatenate([item_emb(hist_item), cat_emb(hist_cat)], -1)
        target = jnp.concatenate(
            [item_emb(target_item), cat_emb(target_cat)], -1
        )[:, None, :]
        seq = jnp.concatenate([hist, target], axis=1)  # (B, T+1, D)
        positions = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (b, t + 1), 1),
            self.position_size - 1,
        )
        seq = seq + pos_emb(positions)
        full_mask = jnp.concatenate(
            [seq_mask, jnp.ones((b, 1), seq_mask.dtype)], axis=1
        )
        x = seq
        for i in range(self.num_blocks):
            x = TransformerBlock(
                self.num_heads, d // self.num_heads, self.ffn_dim,
                name=f"block_{i}",
            )(x, full_mask)
        # masked mean-pool + target position output
        pooled = (x * full_mask[..., None]).sum(1) / jnp.maximum(
            full_mask.sum(1, keepdims=True), 1.0
        )
        feat = jnp.concatenate([pooled, x[:, -1, :]], axis=-1)
        hidden = MLP(list(self.fc_sizes), name="tower")(feat)
        return nn.Dense(1, name="head")(hidden)[:, 0]


@register_model("rank.bst")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        self.item_count = int(config.hyper("item_count", 63001))
        self.cat_count = int(config.hyper("cat_count", 801))
        self.max_seq_len = int(config.hyper("max_seq_len", 64))
        self.module = BSTNet(
            self.item_count,
            self.cat_count,
            int(config.hyper("item_emb_size", 64)),
            int(config.hyper("cat_emb_size", 64)),
            max(int(config.hyper("position_size", 256)), self.max_seq_len + 2),
            int(config.hyper("n_head", 2)),
            int(config.hyper("num_blocks", 1)),
            int(config.hyper("ffn_dim", 128)),
            tuple(config.hyper("fc_sizes", [256, 128, 64])),
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
            "target_item": rng.randint(0, self.item_count, batch_size).astype(np.int32),
            "target_cat": rng.randint(0, self.cat_count, batch_size).astype(np.int32),
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

    def make_dataset(self, data_dir: str, batch_size: int, shuffle=False):
        from paddlerec_tpu.data.slot_reader import list_data_files, shard_files

        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return DINDataset(files, self.max_seq_len, batch_size)
