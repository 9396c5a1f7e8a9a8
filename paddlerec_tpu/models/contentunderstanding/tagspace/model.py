"""TagSpace: text → tag embedding match with margin ranking loss.

Parity target: reference models/contentunderstanding/tagspace/net.py —
text token embeddings through a windowed conv + max-pool into a text
vector; tag embeddings; hinge loss margin between positive-tag and
negative-tag similarities.
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


class TagSpaceNet(nn.Module):
    vocab_text_size: int
    vocab_tag_size: int
    emb_dim: int = 10
    hid_dim: int = 1000
    win_size: int = 5

    @nn.compact
    def __call__(self, tokens, seq_mask, pos_tag, neg_tags):
        text_emb = nn.Embed(self.vocab_text_size, self.emb_dim, name="text_emb")
        tag_emb = nn.Embed(self.vocab_tag_size, self.emb_dim, name="tag_emb")
        x = text_emb(tokens) * seq_mask[..., None]
        conv = jnp.tanh(
            nn.Conv(self.hid_dim, kernel_size=(self.win_size,), padding="SAME",
                    name="conv")(x)
        )
        conv = jnp.where(seq_mask[..., None] > 0, conv, -1e9)
        pooled = conv.max(axis=1)
        text_vec = jnp.tanh(nn.Dense(self.emb_dim, name="proj")(pooled))

        pos_sim = (text_vec * tag_emb(pos_tag)).sum(-1)  # (B,)
        neg_sim = jnp.einsum("be,bne->bn", text_vec, tag_emb(neg_tags))
        return pos_sim, neg_sim


@register_model("contentunderstanding.tagspace")
# Metric note: the streaming "auc" this model logs IS the pairwise
# positive-order ratio (pos/neg sims with 1/0 labels); the reference
# computes the same quantity offline via tools/cal_pos_neg.py.
class ModelDef(ModelDef):
    metric_names = ("pnr",)

    def __init__(self, config: Config):
        super().__init__(config)
        self.vocab_text_size = int(config.hyper("vocab_text_size", 75378))
        self.vocab_tag_size = int(config.hyper("vocab_tag_size", 4))
        self.neg_size = int(config.hyper("neg_size", 3))
        self.margin = float(config.hyper("margin", 0.1))
        self.max_len = int(config.hyper("max_len", 32))
        self.module = TagSpaceNet(
            self.vocab_text_size,
            self.vocab_tag_size,
            int(config.hyper("emb_dim", 10)),
            int(config.hyper("hid_dim", 1000)),
            int(config.hyper("win_size", 5)),
        )

    def model_inputs(self, batch):
        return (
            batch["tokens"],
            batch["seq_mask"],
            batch["pos_tag"],
            batch["neg_tags"],
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        t = self.max_len
        lens = rng.randint(1, t + 1, batch_size)
        seq_mask = (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
        return {
            "tokens": (rng.randint(0, self.vocab_text_size, (batch_size, t))
                       * seq_mask).astype(np.int32),
            "seq_mask": seq_mask,
            "pos_tag": rng.randint(0, self.vocab_tag_size, batch_size).astype(
                np.int32
            ),
            "neg_tags": rng.randint(
                0, self.vocab_tag_size, (batch_size, self.neg_size)
            ).astype(np.int32),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        pos_sim, neg_sim = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        mask = batch.get("mask")
        # hinge: max(0, margin - pos + neg) over negatives
        per = jnp.maximum(
            0.0, self.margin - pos_sim[:, None] + neg_sim
        ).sum(-1)
        if mask is not None:
            loss = (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        else:
            loss = per.mean()
        aux: Aux = {"pos_sim": pos_sim, "neg_sim": neg_sim}
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def metric_updates(self, aux):
        pos = jax.nn.sigmoid(aux["pos_sim"])
        neg = jax.nn.sigmoid(aux["neg_sim"]).reshape(-1)
        preds = jnp.concatenate([pos, neg])
        labels = jnp.concatenate([jnp.ones_like(pos), jnp.zeros_like(neg)])
        mask = aux.get("mask")
        if mask is not None:
            n = aux["neg_sim"].shape[1]
            mask = jnp.concatenate(
                [mask, jnp.repeat(mask[:, None], n, axis=1).reshape(-1)]
            )
        return {"pnr": (preds, labels, mask)}

    def make_dataset(self, data_dir: str, batch_size: int, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return TagSpaceDataset(
            files, self.vocab_tag_size, self.neg_size, self.max_len, batch_size
        )


class TagSpaceDataset:
    """Lines: ``tag_id<TAB>tok tok ...`` or ``tok ... <TAB>tag`` — the
    reference's text2paddle output is ``text_tokens ... \t tag``; uniform
    negative tags sampled per row."""

    def __init__(self, files, vocab_tag, neg_size, max_len, batch_size, seed=0):
        self.files = files
        self.vocab_tag = vocab_tag
        self.neg_size = neg_size
        self.max_len = max_len
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)

    def __iter__(self):
        bs, t = self.batch_size, self.max_len
        rows = []
        for path in self.files:
            with open(path) as f:
                for line in f:
                    parts = line.strip().split("\t")
                    if len(parts) < 2:
                        continue
                    toks = [int(x) for x in parts[0].split()][:t]
                    tag = int(parts[1].split()[0])
                    rows.append((toks, tag))
                    if len(rows) == bs:
                        yield self._emit(rows)
                        rows = []
        if rows:
            yield self._emit(rows, pad_to=bs)

    def _emit(self, rows, pad_to=None):
        bs = pad_to or len(rows)
        t = self.max_len
        tokens = np.zeros((bs, t), np.int32)
        seq_mask = np.zeros((bs, t), np.float32)
        pos = np.zeros((bs,), np.int32)
        mask = np.zeros((bs,), np.float32)
        for r, (toks, tag) in enumerate(rows):
            tokens[r, : len(toks)] = toks
            seq_mask[r, : len(toks)] = 1.0
            pos[r] = tag
            mask[r] = 1.0
        return {
            "tokens": tokens,
            "seq_mask": seq_mask,
            "pos_tag": pos,
            # offset trick guarantees neg != pos (the reference reader
            # rejection-samples the same invariant)
            "neg_tags": (
                (pos[:, None]
                 + self.rng.randint(1, self.vocab_tag, (bs, self.neg_size)))
                % self.vocab_tag
            ).astype(np.int32),
            "mask": mask,
        }
