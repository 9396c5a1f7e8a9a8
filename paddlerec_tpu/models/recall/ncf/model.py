"""NCF (NeuMF / GMF / MLP) collaborative filtering.

Parity target: reference models/recall/ncf/net.py:22-237 — GMF
(elementwise product of user/item factors) and MLP branches over separate
embeddings, fused NeuMF head; mode selected by hyper_parameters.mode.
Eval protocol (HR@K / NDCG@K over grouped negatives) lives in
tools/ncf_eval.py, mirroring the reference's infer flow.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.data.slot_reader import list_data_files, shard_files
from paddlerec_tpu.models.base import Aux, ModelDef, binary_logloss
from paddlerec_tpu.ops.layers import MLP


class NCFNet(nn.Module):
    num_users: int
    num_items: int
    mf_dim: int = 8
    fc_layers: Sequence[int] = (64, 32, 16, 8)
    mode: str = "NCF_NeuMF"

    @nn.compact
    def __call__(self, users: jnp.ndarray, items: jnp.ndarray):
        outs = []
        valid = ("NCF_NeuMF", "NCF_GMF", "NCF_MLP")
        if self.mode not in valid:
            raise ValueError(
                f"unknown ncf mode {self.mode!r}; choose one of {valid}"
            )
        if self.mode in ("NCF_NeuMF", "NCF_GMF"):
            ue = nn.Embed(self.num_users, self.mf_dim, name="mf_user")(users)
            ie = nn.Embed(self.num_items, self.mf_dim, name="mf_item")(items)
            outs.append(ue * ie)
        if self.mode in ("NCF_NeuMF", "NCF_MLP"):
            dim = self.fc_layers[0] // 2
            ue = nn.Embed(self.num_users, dim, name="mlp_user")(users)
            ie = nn.Embed(self.num_items, dim, name="mlp_item")(items)
            h = jnp.concatenate([ue, ie], axis=-1)
            h = MLP(list(self.fc_layers[1:]), name="mlp_tower",
                    output_activation="relu")(h)
            outs.append(h)
        feat = jnp.concatenate(outs, axis=-1)
        return nn.Dense(1, name="head")(feat)[:, 0]


@register_model("recall.ncf")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        self.num_users = int(config.hyper("num_users", 6040))
        self.num_items = int(config.hyper("num_items", 3706))
        self.module = NCFNet(
            self.num_users,
            self.num_items,
            int(config.hyper("mf_dim", 8)),
            config.hyper("fc_layers", [64, 32, 16, 8]),
            str(config.hyper("mode", "NCF_NeuMF")),
        )

    def model_inputs(self, batch):
        return (batch["users"], batch["items"])

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        return {
            "users": rng.randint(0, self.num_users, batch_size).astype(np.int32),
            "items": rng.randint(0, self.num_items, batch_size).astype(np.int32),
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
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return NCFDataset(files, batch_size)


class NCFDataset:
    """CSV lines ``user,item,label`` (movielens_reader.py format)."""

    def __init__(self, files, batch_size):
        self.files = files
        self.batch_size = batch_size

    def __iter__(self):
        users, items, labels = [], [], []
        for path in self.files:
            with open(path) as f:
                for line in f:
                    parts = line.strip().split(",")
                    if len(parts) < 3:
                        continue
                    users.append(int(parts[0]))
                    items.append(int(parts[1]))
                    labels.append(float(parts[2]))
                    if len(users) == self.batch_size:
                        yield self._emit(users, items, labels, self.batch_size)
                        users, items, labels = [], [], []
        if users:
            yield self._emit(users, items, labels, self.batch_size)

    @staticmethod
    def _emit(users, items, labels, bs):
        n = len(users)
        pad = bs - n
        mask = np.concatenate([np.ones(n), np.zeros(pad)]).astype(np.float32)
        return {
            "users": np.asarray(users + [0] * pad, np.int32),
            "items": np.asarray(items + [0] * pad, np.int32),
            "label": np.asarray(labels + [0.0] * pad, np.float32),
            "mask": mask,
        }
