"""DeepRec: deep autoencoder for collaborative-filtering rating prediction.

Parity target: reference models/rank/deeprec/net.py:19-65 — symmetric
SELU encoder/decoder over a user's item-rating vector; loss is masked MSE
on observed (non-zero) ratings (dygraph_model.py:41-49); metric is RMSE.
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
from paddlerec_tpu.models.base import Aux, ModelDef


class DeepRecNet(nn.Module):
    layer_sizes: Sequence[int]  # [n_items, h1, ..., code]

    @nn.compact
    def __call__(self, ratings):
        x = ratings
        for i, d in enumerate(self.layer_sizes[1:]):
            x = nn.selu(nn.Dense(d, name=f"encoder_{i}")(x))
        for i, d in enumerate(reversed(self.layer_sizes[:-1])):
            x = nn.selu(nn.Dense(d, name=f"decoder_{i}")(x))
        return x


@register_model("rank.deeprec")
class ModelDef(ModelDef):
    metrics = "none"  # RMSE is reported from the loss, not a streaming AUC
    metric_names = ()

    def __init__(self, config: Config):
        super().__init__(config)
        self.layer_sizes = [
            int(v) for v in config.hyper("layer_sizes", [17769, 512, 512, 1024])
        ]
        self.module = DeepRecNet(self.layer_sizes)

    def model_inputs(self, batch):
        return (batch["ratings"],)

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        n = self.layer_sizes[0]
        ratings = rng.randint(0, 6, (batch_size, n)).astype(np.float32)
        ratings *= rng.rand(batch_size, n) < 0.01  # sparse observations
        return {"ratings": ratings}

    def train_forward(self, params, batch):
        ratings = batch["ratings"]
        out = self.module.apply({"params": params}, ratings)
        mask = (ratings != 0).astype(jnp.float32)
        num = jnp.maximum(mask.sum(), 1.0)
        loss = (jnp.square(out - ratings) * mask).sum() / num
        aux: Aux = {"outputs": out, "rmse": jnp.sqrt(loss)}
        return loss, aux

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return RatingVectorDataset(files, self.layer_sizes[0], batch_size)


class RatingVectorDataset:
    """Lines of ``item_idx:rating`` pairs per user (Netflix-style sparse
    rows, reference models/rank/deeprec/reader.py)."""

    def __init__(self, files, n_items, batch_size):
        self.files = files
        self.n_items = n_items
        self.batch_size = batch_size

    def __iter__(self):
        bs = self.batch_size
        rows = np.zeros((bs, self.n_items), np.float32)
        i = 0

        def emit_tail():
            # pad the tail to the static batch (variable shapes break
            # multi-device batch sharding); rows beyond i are zero and
            # self-masking (AutoRec loss only counts observed ratings)
            return {"ratings": rows.copy(),
                    "mask": (np.arange(bs) < i).astype(np.float32)}

        # two accepted formats:
        #  * 'idx:rating idx:rating ...' — one user vector per line
        #  * the reference Netflix TSV 'user \t item \t rating' triples
        #    (netflix_reader.py:44-66) — aggregated into per-user rows
        triples = {}
        for path in self.files:
            with open(path) as f:
                for line in f:
                    toks = line.split()
                    if not toks:
                        continue
                    if ":" not in toks[0]:
                        if len(toks) >= 3:  # reference TSV triple
                            u, it, r = int(toks[0]), int(toks[1]), float(toks[2])
                            if 0 <= it < self.n_items:
                                triples.setdefault(u, []).append((it, r))
                        continue
                    for t in toks:
                        idx, _, r = t.partition(":")
                        j = int(idx)
                        if 0 <= j < self.n_items:
                            rows[i, j] = float(r)
                    i += 1
                    if i == bs:
                        yield {"ratings": rows.copy(),
                               "mask": np.ones(bs, np.float32)}
                        rows[:] = 0
                        i = 0
        for u in sorted(triples):
            for it, r in triples[u]:
                rows[i, it] = r
            i += 1
            if i == bs:
                yield {"ratings": rows.copy(),
                       "mask": np.ones(bs, np.float32)}
                rows[:] = 0
                i = 0
        if i:
            yield emit_tail()
