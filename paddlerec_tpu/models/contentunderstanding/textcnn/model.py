"""TextCNN sentence classifier.

Parity target: reference models/contentunderstanding/textcnn/net.py —
token embeddings, parallel 1-D convs of filter sizes {1,2,3} × cnn_dim,
max-pool over time, hidden tanh layer, softmax over class_dim.
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


class TextCNNNet(nn.Module):
    dict_dim: int
    emb_dim: int = 128
    cnn_dim: int = 128
    filter_sizes: tuple = (1, 2, 3)
    hid_dim: int = 96
    class_dim: int = 2

    @nn.compact
    def __call__(self, tokens, seq_mask):
        emb = nn.Embed(self.dict_dim, self.emb_dim, name="embedding")(tokens)
        emb = emb * seq_mask[..., None]
        pooled = []
        for fs in self.filter_sizes:
            conv = nn.Conv(self.cnn_dim, kernel_size=(fs,), padding="SAME",
                           name=f"conv_{fs}")(emb)
            conv = jnp.tanh(conv)
            conv = jnp.where(seq_mask[..., None] > 0, conv, -1e9)
            pooled.append(conv.max(axis=1))
        feat = jnp.concatenate(pooled, axis=-1)
        hidden = jnp.tanh(nn.Dense(self.hid_dim, name="hidden")(feat))
        return nn.Dense(self.class_dim, name="head")(hidden)


@register_model("contentunderstanding.textcnn")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        self.dict_dim = int(config.hyper("dict_dim", 33257))
        self.max_len = int(config.hyper("max_len", 100))
        self.class_dim = int(config.hyper("class_dim", 2))
        sizes = tuple(
            int(config.hyper(f"cnn_filter_size{i}", d))
            for i, d in ((1, 1), (2, 2), (3, 3))
        )
        self.module = TextCNNNet(
            self.dict_dim,
            int(config.hyper("emb_dim", 128)),
            int(config.hyper("cnn_dim", 128)),
            sizes,
            int(config.hyper("hid_dim", 96)),
            self.class_dim,
        )

    def model_inputs(self, batch):
        return (batch["tokens"], batch["seq_mask"])

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        t = self.max_len
        lens = rng.randint(1, t + 1, batch_size)
        seq_mask = (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
        return {
            "tokens": (rng.randint(0, self.dict_dim, (batch_size, t))
                       * seq_mask).astype(np.int32),
            "seq_mask": seq_mask,
            "label": rng.randint(0, self.class_dim, batch_size).astype(np.int32),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        logits = self.module.apply({"params": params}, *self.model_inputs(batch))
        labels = batch["label"].astype(jnp.int32)
        mask = batch.get("mask")
        per = -jax.nn.log_softmax(logits)[jnp.arange(logits.shape[0]), labels]
        if mask is not None:
            loss = (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        else:
            loss = per.mean()
        probs = jax.nn.softmax(logits)[:, 1] if self.class_dim == 2 else None
        aux: Aux = {"labels": labels.astype(jnp.float32)}
        if probs is not None:
            aux["predictions"] = probs
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def metric_updates(self, aux):
        if "predictions" not in aux:
            return {}
        return {"auc": (aux["predictions"], aux["labels"], aux.get("mask"))}

    def make_dataset(self, data_dir: str, batch_size: int, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return TextCNNDataset(files, self.max_len, batch_size)


class TextCNNDataset:
    """Lines: ``tok tok ... tok seq_len label`` (senta-format, padded to
    max_len by the preprocessing; reference senta_data format)."""

    def __init__(self, files, max_len, batch_size):
        self.files = files
        self.max_len = max_len
        self.batch_size = batch_size

    def __iter__(self):
        bs, t = self.batch_size, self.max_len
        tokens = np.zeros((bs, t), np.int32)
        seq_mask = np.zeros((bs, t), np.float32)
        labels = np.zeros((bs,), np.int32)
        row = 0
        for path in self.files:
            with open(path) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) < 3:
                        continue
                    label = int(parts[-1])
                    seq_len = min(int(parts[-2]), t)
                    toks = [int(x) for x in parts[:-2]][:t]
                    tokens[row, : len(toks)] = toks
                    seq_mask[row, :seq_len] = 1.0
                    labels[row] = label
                    row += 1
                    if row == bs:
                        yield {
                            "tokens": tokens.copy(),
                            "seq_mask": seq_mask.copy(),
                            "label": labels.copy(),
                            "mask": np.ones(bs, np.float32),
                        }
                        tokens[:] = 0
                        seq_mask[:] = 0
                        row = 0
        if row:
            mask = np.zeros(bs, np.float32)
            mask[:row] = 1.0
            yield {
                "tokens": tokens.copy(),
                "seq_mask": seq_mask.copy(),
                "label": labels.copy(),
                "mask": mask,
            }
