"""Multitask model bases + dataset readers.

Covers the two data regimes of the reference's multitask family:
  * Census-income CSV (MMoE/PLE/ShareBottom): 2 binary labels + 499 dense
    features per row (models/multitask/mmoe/census_reader.py).
  * Ali-CCP slot format (ESMM/AITM/ESCM2): 23 multi-hot categorical fields,
    click + conversion labels (models/multitask/esmm/esmm_reader.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.data.slot_reader import list_data_files, shard_files
from paddlerec_tpu.models.base import Aux, Batch, ModelDef


class DenseMultitaskModelDef(ModelDef):
    """Census-style: dense features → T binary heads (probabilities).

    The module maps (B, feature_size) → (B, T) probabilities in [0, 1]
    (reference towers end in softmax over 2 classes; we emit p(class=1)).
    """

    task_names: Tuple[str, ...] = ("income", "marital")

    def __init__(self, config: Config):
        super().__init__(config)
        self.feature_size = int(config.hyper("feature_size", 499))
        self.metric_names = self.task_names

    def model_inputs(self, batch: Batch):
        return (batch["dense"],)

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        dense = rng.rand(batch_size, self.feature_size).astype(np.float32)
        labels = (rng.rand(batch_size, len(self.task_names)) < 0.3).astype(
            np.float32
        )
        return {"dense": dense, "labels": labels,
                "mask": np.ones(batch_size, np.float32)}

    def train_forward(self, params, batch):
        probs = self.module.apply({"params": params}, *self.model_inputs(batch))
        probs = jnp.clip(probs, 1e-7, 1 - 1e-7)
        labels = batch["labels"].astype(jnp.float32)
        mask = batch.get("mask")
        per = -(labels * jnp.log(probs) + (1 - labels) * jnp.log(1 - probs))
        if mask is not None:
            loss = (per.sum(-1) * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        else:
            loss = per.sum(-1).mean()
        aux: Aux = {"probs": probs, "labels": labels}
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def metric_updates(self, aux):
        mask = aux.get("mask")
        return {
            name: (aux["probs"][:, i], aux["labels"][:, i], mask)
            for i, name in enumerate(self.task_names)
        }

    def make_dataset(self, data_dir: str, batch_size: int, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return CensusDataset(files, self.feature_size, len(self.task_names),
                             batch_size)


class CensusDataset:
    """CSV of floats: col0 = marital label, col1 = income label, rest dense.

    Emits labels ordered (income, marital) to match the reference's
    fetch order (census_reader.py:17-27).
    """

    def __init__(self, files, feature_size, num_tasks, batch_size):
        self.files = files
        self.feature_size = feature_size
        self.batch_size = batch_size

    def __iter__(self):
        rows, labels = [], []
        for path in self.files:
            with open(path) as f:
                for line in f:
                    vals = line.strip().split(",")
                    if len(vals) < 3:
                        continue
                    marital = float(vals[0])
                    income = float(vals[1])
                    feats = [float(v) for v in vals[2 : 2 + self.feature_size]]
                    if len(feats) < self.feature_size:
                        feats += [0.0] * (self.feature_size - len(feats))
                    rows.append(feats)
                    labels.append([income, marital])
                    if len(rows) == self.batch_size:
                        yield {
                            "dense": np.asarray(rows, np.float32),
                            "labels": np.asarray(labels, np.float32),
                            "mask": np.ones(self.batch_size, np.float32),
                        }
                        rows, labels = [], []
        if rows:
            n = len(rows)
            pad = self.batch_size - n
            dense = np.concatenate(
                [np.asarray(rows, np.float32),
                 np.zeros((pad, self.feature_size), np.float32)]
            )
            labs = np.concatenate(
                [np.asarray(labels, np.float32), np.zeros((pad, 2), np.float32)]
            )
            mask = np.concatenate([np.ones(n), np.zeros(pad)]).astype(np.float32)
            yield {"dense": dense, "labels": labs, "mask": mask}


class AliCCPModelDef(ModelDef):
    """Ali-CCP style: multi-hot sparse fields → (ctr, cvr) probabilities."""

    metric_names = ("ctr", "ctcvr")

    def __init__(self, config: Config):
        super().__init__(config)
        self.vocab_size = int(config.hyper("sparse_feature_number", 737946))
        self.embedding_dim = int(config.hyper("sparse_feature_dim", 12))
        self.num_field = int(config.hyper("num_field", 23))
        self.max_len = int(config.hyper("max_len", 3))

    def model_inputs(self, batch: Batch):
        return (batch["sparse"], batch.get("sparse_mask"))

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        sparse = rng.randint(
            1, self.vocab_size, size=(batch_size, self.num_field, self.max_len)
        ).astype(np.int64)
        sparse_mask = (rng.rand(batch_size, self.num_field, self.max_len) < 0.7
                       ).astype(np.float32)
        sparse_mask[:, :, 0] = 1.0
        click = (rng.rand(batch_size) < 0.5).astype(np.float32)
        conversion = click * (rng.rand(batch_size) < 0.5)
        return {
            "sparse": sparse,
            "sparse_mask": sparse_mask,
            "labels": np.stack([click, conversion], -1).astype(np.float32),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        ctr_prob, cvr_prob = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        ctr_prob = jnp.clip(ctr_prob, 1e-7, 1 - 1e-7)
        ctcvr_prob = jnp.clip(ctr_prob * cvr_prob, 1e-7, 1 - 1e-7)
        click = batch["labels"][:, 0]
        conversion = batch["labels"][:, 1]
        mask = batch.get("mask")

        def bce(p, y):
            per = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
            if mask is not None:
                return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)
            return per.mean()

        loss = bce(ctr_prob, click) + bce(ctcvr_prob, conversion)
        aux: Aux = {
            "ctr": ctr_prob,
            "ctcvr": ctcvr_prob,
            "click": click,
            "conversion": conversion,
        }
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def metric_updates(self, aux):
        mask = aux.get("mask")
        return {
            "ctr": (aux["ctr"], aux["click"], mask),
            "ctcvr": (aux["ctcvr"], aux["conversion"], mask),
        }

    def make_dataset(self, data_dir: str, batch_size: int, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return AliCCPDataset(files, self.num_field, self.max_len, batch_size)


# the 23 field ids of the Ali-CCP release, in the reference's order
# (models/multitask/esmm/esmm_reader.py:14-19)
ALI_CCP_FIELDS = [
    "101", "109_14", "110_14", "127_14", "150_14", "121", "122", "124",
    "125", "126", "127", "128", "129", "205", "206", "207", "210",
    "216", "508", "509", "702", "853", "301",
]


class AliCCPDataset:
    """Ali-CCP lines: ``sample_id,click,conversion,common_feature_index,
    field:feat_id ...`` → (B, F, L) padded multi-hot ids + (B, F, L) mask."""

    def __init__(self, files, num_field, max_len, batch_size):
        self.files = files
        self.num_field = num_field
        self.max_len = max_len
        self.batch_size = batch_size
        self.field_index = {f: i for i, f in enumerate(ALI_CCP_FIELDS)}

    def __iter__(self):
        bs, nf, ml = self.batch_size, self.num_field, self.max_len
        sparse = np.zeros((bs, nf, ml), np.int64)
        smask = np.zeros((bs, nf, ml), np.float32)
        labels = np.zeros((bs, 2), np.float32)
        row = 0
        for path in self.files:
            with open(path) as f:
                for line in f:
                    parts = line.strip().split(",")
                    if len(parts) < 5:
                        continue
                    labels[row, 0] = float(parts[1])
                    labels[row, 1] = float(parts[2])
                    counts = [0] * nf
                    for tok in parts[4:]:
                        fid, _, feat = tok.partition(":")
                        i = self.field_index.get(fid)
                        if i is None or counts[i] >= ml:
                            continue
                        sparse[row, i, counts[i]] = int(feat)
                        smask[row, i, counts[i]] = 1.0
                        counts[i] += 1
                    row += 1
                    if row == bs:
                        yield {
                            "sparse": sparse.copy(),
                            "sparse_mask": smask.copy(),
                            "labels": labels.copy(),
                            "mask": np.ones(bs, np.float32),
                        }
                        sparse[:] = 0
                        smask[:] = 0
                        labels[:] = 0
                        row = 0
        if row:
            mask = np.zeros(bs, np.float32)
            mask[:row] = 1.0
            yield {
                "sparse": sparse.copy(),
                "sparse_mask": smask.copy(),
                "labels": labels.copy(),
                "mask": mask,
            }
