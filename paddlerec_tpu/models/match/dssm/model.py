"""DSSM two-tower semantic match.

Parity target: reference models/match/dssm/net.py:21-70 — query tower and
doc tower (MLPs over trigram one-hot vectors, tanh in reference's paper but
relu per config fc_acts), cosine similarity, softmax over [pos, neg...]
with -log p(pos) loss.

Metric note: the streaming "auc" this model reports IS the pairwise
positive-order ratio (AUC == P(pos ranked above neg) when predictions are
pos/neg similarities with 1/0 labels) — the reference computes the same
quantity offline via tools/cal_pos_neg.py.
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
from paddlerec_tpu.models.base import ModelDef
from paddlerec_tpu.ops.layers import MLP


def cosine(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    num = (a * b).sum(-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, eps)


class DSSMNet(nn.Module):
    fc_sizes: Sequence[int]

    @nn.compact
    def __call__(self, query, doc_pos, doc_negs):
        # query/doc_pos: (B, D); doc_negs: (B, N, D)
        q = MLP(list(self.fc_sizes), name="query_tower",
                output_activation="relu")(query)
        doc_tower = MLP(list(self.fc_sizes), name="doc_tower",
                        output_activation="relu")
        dp = doc_tower(doc_pos)
        dn = doc_tower(doc_negs)  # (B, N, H)
        sim_pos = cosine(q, dp)  # (B,)
        sim_neg = cosine(q[:, None, :], dn)  # (B, N)
        return sim_pos, sim_neg


@register_model("match.dssm")
class ModelDef(ModelDef):
    metric_names = ("pnr",)  # positive-order ratio via the AUC identity

    def __init__(self, config: Config):
        super().__init__(config)
        self.trigram_d = int(config.hyper("trigram_d", 2900))
        self.neg_num = int(config.hyper("neg_num", 1))
        fc_sizes = config.hyper("fc_sizes", [300, 300, 128])
        self.module = DSSMNet(fc_sizes)

    def model_inputs(self, batch):
        return (batch["query"], batch["doc_pos"], batch["doc_negs"])

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        d = self.trigram_d

        def trig(*shape):
            return (rng.rand(*shape) < 0.01).astype(np.float32)

        return {
            "query": trig(batch_size, d),
            "doc_pos": trig(batch_size, d),
            "doc_negs": trig(batch_size, self.neg_num, d),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        sim_pos, sim_neg = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        # softmax over [pos, negs] scaled like the reference (gamma fixed 1)
        logits = jnp.concatenate([sim_pos[:, None], sim_neg], axis=1)
        logp = jax.nn.log_softmax(logits, axis=1)
        mask = batch.get("mask")
        per = -logp[:, 0]
        if mask is not None:
            loss = (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        else:
            loss = per.mean()
        aux = {"sim_pos": sim_pos, "sim_neg": sim_neg}
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def metric_updates(self, aux):
        # pos sims labelled 1, neg sims labelled 0; normalize sims to [0,1]
        pos = (aux["sim_pos"] + 1.0) / 2.0
        neg = ((aux["sim_neg"] + 1.0) / 2.0).reshape(-1)
        preds = jnp.concatenate([pos, neg])
        labels = jnp.concatenate([jnp.ones_like(pos), jnp.zeros_like(neg)])
        mask = aux.get("mask")
        if mask is not None:
            n = aux["sim_neg"].shape[1]
            mask = jnp.concatenate(
                [mask, jnp.repeat(mask[:, None], n, axis=1).reshape(-1)]
            )
        return {"pnr": (preds, labels, mask)}

    def make_dataset(self, data_dir: str, batch_size: int, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return DSSMDataset(files, self.trigram_d, self.neg_num, batch_size)


class DSSMDataset:
    """Tab-separated query/pos/neg… one-hot trigram vectors (BQ dataset
    format of the reference, models/match/dssm/bq_reader_train.py)."""

    def __init__(self, files, trigram_d, neg_num, batch_size):
        self.files = files
        self.trigram_d = trigram_d
        self.neg_num = neg_num
        self.batch_size = batch_size

    def __iter__(self):
        bs, d, n = self.batch_size, self.trigram_d, self.neg_num
        q = np.zeros((bs, d), np.float32)
        pos = np.zeros((bs, d), np.float32)
        negs = np.zeros((bs, n, d), np.float32)
        row = 0
        for path in self.files:
            with open(path) as f:
                for line in f:
                    cols = line.rstrip("\n").split("\t")
                    if len(cols) < 2 + n:
                        continue
                    def put(dst, col):
                        # prefix assignment: short/malformed vectors
                        # zero-pad instead of crashing the epoch
                        arr = np.array(col.split(","), dtype=np.float32)[:d]
                        dst[: len(arr)] = arr
                        dst[len(arr):] = 0.0

                    put(q[row], cols[0])
                    put(pos[row], cols[1])
                    for j in range(n):
                        put(negs[row, j], cols[2 + j])
                    row += 1
                    if row == bs:
                        yield {
                            "query": q.copy(),
                            "doc_pos": pos.copy(),
                            "doc_negs": negs.copy(),
                            "mask": np.ones(bs, np.float32),
                        }
                        q[:] = 0; pos[:] = 0; negs[:] = 0
                        row = 0
        if row:
            mask = np.zeros(bs, np.float32)
            mask[:row] = 1.0
            yield {
                "query": q.copy(),
                "doc_pos": pos.copy(),
                "doc_negs": negs.copy(),
                "mask": mask,
            }
