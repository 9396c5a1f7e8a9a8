"""Multiview-SimNet: multi-slot two-tower matching.

Parity target: reference models/match/multiview-simnet/net.py — query and
title each carry multiple text slots; per-slot embeddings are encoded
(bag-of-words sum encoder), concatenated, projected, and matched by cosine
with a pairwise hinge loss against in-batch rotated negatives.
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
from paddlerec_tpu.models.match.dssm.model import cosine


class MultiviewSimnetNet(nn.Module):
    vocab_size: int
    emb_dim: int = 128
    hidden_size: int = 128

    @nn.compact
    def __call__(self, q_slots, q_mask, t_slots, t_mask):
        # slots: (B, S, T) token ids; mask: (B, S, T)
        emb = nn.Embed(self.vocab_size, self.emb_dim, name="embedding")

        def encode(slots, mask, name):
            vecs = emb(slots) * mask[..., None]  # (B, S, T, E)
            pooled = vecs.sum(axis=2)  # bag-of-words per slot
            b = pooled.shape[0]
            flat = pooled.reshape(b, -1)
            return jnp.tanh(nn.Dense(self.hidden_size, name=name)(flat))

        q = encode(q_slots, q_mask, "query_proj")
        t = encode(t_slots, t_mask, "title_proj")
        return q, t


@register_model("match.multiview_simnet")
class ModelDef(ModelDef):
    metric_names = ("pnr",)

    def __init__(self, config: Config):
        super().__init__(config)
        self.vocab_size = int(
            config.hyper("sparse_feature_number", config.hyper("vocab_size", 89777))
        )
        self.query_slots = int(config.hyper("query_slots", 1))
        self.title_slots = int(config.hyper("title_slots", 1))
        self.max_len = int(config.hyper("max_len", 8))
        self.margin = float(config.hyper("margin", 0.1))
        self.module = MultiviewSimnetNet(
            self.vocab_size,
            int(config.hyper("embedding_dim", 128)),
            int(config.hyper("hidden_size", 128)),
        )

    def model_inputs(self, batch):
        return (
            batch["q_slots"],
            batch["q_mask"],
            batch["t_slots"],
            batch["t_mask"],
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)

        def slots(s):
            ids = rng.randint(
                1, self.vocab_size, (batch_size, s, self.max_len)
            ).astype(np.int32)
            m = (rng.rand(batch_size, s, self.max_len) < 0.8).astype(np.float32)
            m[:, :, 0] = 1
            return ids, m

        q, qm = slots(self.query_slots)
        t, tm = slots(self.title_slots)
        return {
            "q_slots": q, "q_mask": qm, "t_slots": t, "t_mask": tm,
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        q, t = self.module.apply({"params": params}, *self.model_inputs(batch))
        pos = cosine(q, t)  # (B,)
        # in-batch rotated negatives (reference pairs each query with the
        # next title in the batch)
        neg = cosine(q, jnp.roll(t, shift=1, axis=0))
        mask = batch.get("mask")
        per = jnp.maximum(0.0, self.margin - pos + neg)
        if mask is not None:
            # a rolled negative is only real if ITS source row is valid
            # too — padded rows' titles are constants, not negatives
            neg_mask = mask * jnp.roll(mask, shift=1, axis=0)
            loss = (per * neg_mask).sum() / jnp.maximum(neg_mask.sum(), 1.0)
        else:
            neg_mask = None
            loss = per.mean()
        aux: Aux = {"sim_pos": pos, "sim_neg": neg[:, None]}
        if mask is not None:
            aux["mask"] = mask
            aux["neg_mask"] = neg_mask
        return loss, aux

    def metric_updates(self, aux):
        pos = (aux["sim_pos"] + 1.0) / 2.0
        neg = ((aux["sim_neg"] + 1.0) / 2.0).reshape(-1)
        preds = jnp.concatenate([pos, neg])
        labels = jnp.concatenate([jnp.ones_like(pos), jnp.zeros_like(neg)])
        mask = aux.get("mask")
        if mask is not None:
            mask = jnp.concatenate([mask, aux["neg_mask"]])
        return {"pnr": (preds, labels, mask)}

    def make_dataset(self, data_dir: str, batch_size: int, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return MultiviewDataset(
            files, self.query_slots, self.title_slots, self.max_len, batch_size
        )


class MultiviewDataset:
    """Lines: per-slot token lists — ``q_tokens... \t t_tokens...`` with
    slots separated by ';' and tokens space-separated."""

    def __init__(self, files, query_slots, title_slots, max_len, batch_size):
        self.files = files
        self.query_slots = query_slots
        self.title_slots = title_slots
        self.max_len = max_len
        self.batch_size = batch_size

    def __iter__(self):
        bs, t = self.batch_size, self.max_len
        q = np.zeros((bs, self.query_slots, t), np.int32)
        qm = np.zeros((bs, self.query_slots, t), np.float32)
        ti = np.zeros((bs, self.title_slots, t), np.int32)
        tm = np.zeros((bs, self.title_slots, t), np.float32)
        row = 0
        for path in self.files:
            with open(path) as f:
                for line in f:
                    cols = line.rstrip("\n").split("\t")
                    if len(cols) < 2:
                        continue
                    for dst, dstm, spec, n_slots in (
                        (q, qm, cols[0], self.query_slots),
                        (ti, tm, cols[1], self.title_slots),
                    ):
                        for si, slot in enumerate(spec.split(";")[:n_slots]):
                            toks = [int(x) for x in slot.split()][:t]
                            dst[row, si, : len(toks)] = toks
                            dstm[row, si, : len(toks)] = 1.0
                    row += 1
                    if row == bs:
                        yield {
                            "q_slots": q.copy(), "q_mask": qm.copy(),
                            "t_slots": ti.copy(), "t_mask": tm.copy(),
                            "mask": np.ones(bs, np.float32),
                        }
                        q[:] = 0; qm[:] = 0; ti[:] = 0; tm[:] = 0
                        row = 0
        if row:
            mask = np.zeros(bs, np.float32)
            mask[:row] = 1.0
            yield {
                "q_slots": q.copy(), "q_mask": qm.copy(),
                "t_slots": ti.copy(), "t_mask": tm.copy(),
                "mask": mask,
            }
