"""word2vec: skip-gram with negative sampling.

Parity target: reference models/recall/word2vec/net.py:20-115 — input and
output embedding tables, BCE over (center, context) positives and sampled
negatives, window-based pair generation in the reader
(w2v_reader.py), analogy eval a-b+c→d offline.
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


class SkipGramNet(nn.Module):
    vocab_size: int
    embedding_dim: int

    @nn.compact
    def __call__(self, center, pos, negs):
        # reference inits (net.py): input table Uniform(±0.5/dim), output
        # table zero, plus a per-word output BIAS embedding (zero-init)
        # added to both logits — without it frequent-word calibration is
        # impossible and initial logits sit far from 0
        bound = 0.5 / self.embedding_dim
        in_emb = nn.Embed(
            self.vocab_size, self.embedding_dim, name="in_emb",
            embedding_init=nn.initializers.uniform(scale=2 * bound),
        )
        out_emb = nn.Embed(
            self.vocab_size, self.embedding_dim, name="out_emb",
            embedding_init=nn.initializers.zeros,
        )
        out_bias = nn.Embed(
            self.vocab_size, 1, name="out_bias",
            embedding_init=nn.initializers.zeros,
        )
        c = in_emb(center) - bound  # uniform(0,2b) - b = uniform(±b)
        p = out_emb(pos)  # (B, E)
        n = out_emb(negs)  # (B, N, E)
        pos_logit = (c * p).sum(-1) + out_bias(pos)[..., 0]  # (B,)
        neg_logit = (
            jnp.einsum("be,bne->bn", c, n) + out_bias(negs)[..., 0]
        )  # (B, N)
        return pos_logit, neg_logit


@register_model("recall.word2vec")
class ModelDef(ModelDef):
    metric_names = ("auc",)  # pos-vs-neg separability

    def __init__(self, config: Config):
        super().__init__(config)
        self.vocab_size = int(config.hyper("sparse_feature_number", 1000))
        self.embedding_dim = int(config.hyper("sparse_feature_dim", 300))
        self.neg_num = int(config.hyper("neg_num", 5))
        self.window_size = int(config.hyper("window_size", 5))
        self.module = SkipGramNet(self.vocab_size, self.embedding_dim)

    def model_inputs(self, batch):
        return (batch["center"], batch["pos"], batch["negs"])

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        return {
            "center": rng.randint(0, self.vocab_size, batch_size).astype(np.int32),
            "pos": rng.randint(0, self.vocab_size, batch_size).astype(np.int32),
            "negs": rng.randint(
                0, self.vocab_size, (batch_size, self.neg_num)
            ).astype(np.int32),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        pos_logit, neg_logit = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        mask = batch.get("mask")
        pos_loss = jnp.logaddexp(0.0, -pos_logit)  # -log σ(pos)
        neg_loss = jnp.logaddexp(0.0, neg_logit).sum(-1)  # -Σ log σ(-neg)
        per = pos_loss + neg_loss
        if mask is not None:
            loss = (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        else:
            loss = per.mean()
        aux: Aux = {"pos_logit": pos_logit, "neg_logit": neg_logit}
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def metric_updates(self, aux):
        pos = jax.nn.sigmoid(aux["pos_logit"])
        neg = jax.nn.sigmoid(aux["neg_logit"]).reshape(-1)
        preds = jnp.concatenate([pos, neg])
        labels = jnp.concatenate([jnp.ones_like(pos), jnp.zeros_like(neg)])
        mask = aux.get("mask")
        if mask is not None:
            n = aux["neg_logit"].shape[1]
            mask = jnp.concatenate(
                [mask, jnp.repeat(mask[:, None], n, axis=1).reshape(-1)]
            )
        return {"auc": (preds, labels, mask)}

    def _neg_sampler(self, files):
        """Frequency-weighted (unigram^0.75) negative sampler — the
        reference's alias-distribution contract
        (word2vec_reader.py:66-78,116).  Counts come from
        runner.word_count_dict_path when it ships with the data (the
        reference's preprocess emits it) or from one counting pass over
        the corpus otherwise; hyper_parameters.neg_sampling: uniform
        opts out."""
        from paddlerec_tpu.core.config import resolve_path
        from paddlerec_tpu.data.alias import (
            AliasSampler, counts_from_corpus, counts_from_dict_file,
        )

        mode = str(self.config.hyper("neg_sampling", "frequency")).lower()
        if mode == "uniform":
            return None
        dict_path = self.config.runner("word_count_dict_path")
        if dict_path:
            counts = counts_from_dict_file(
                resolve_path(self.config, "runner.word_count_dict_path"),
                self.vocab_size,
            )
        else:
            counts = counts_from_corpus(files, self.vocab_size)
        if counts.sum() <= 0:
            return None
        power = float(self.config.hyper("neg_sampling_power", 0.75))
        return AliasSampler(counts, power=power,
                            seed=int(self.config.runner("seed", 2023)))

    def make_dataset(self, data_dir: str, batch_size: int, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return SkipGramDataset(
            files, self.vocab_size, self.window_size, self.neg_num,
            batch_size, neg_sampler=self._neg_sampler(files),
        )

    def embedding_table(self, params) -> np.ndarray:
        """Input embeddings for analogy / nearest-neighbor eval."""
        return np.asarray(params["in_emb"]["embedding"])


class SkipGramDataset:
    """Space-separated token-id lines → (center, context, negatives).

    Window pairs mirror the reference's reader; negatives come from the
    frequency alias sampler (unigram^0.75, the reference's
    word2vec_reader.py:76-78 distribution) when one is provided, else
    uniform.
    """

    def __init__(self, files, vocab, window, neg_num, batch_size, seed=0,
                 neg_sampler=None):
        self.files = files
        self.vocab = vocab
        self.window = window
        self.neg_num = neg_num
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)
        self.neg_sampler = neg_sampler

    def __iter__(self):
        centers, positives = [], []
        for path in self.files:
            with open(path) as f:
                for line in f:
                    ids = [int(t) for t in line.split()]
                    for i, c in enumerate(ids):
                        w = self.rng.randint(1, self.window + 1)
                        for j in range(max(0, i - w), min(len(ids), i + w + 1)):
                            if j == i:
                                continue
                            centers.append(c)
                            positives.append(ids[j])
                            if len(centers) == self.batch_size:
                                yield self._emit(centers, positives)
                                centers, positives = [], []
        if centers:
            pad = self.batch_size - len(centers)
            mask = np.concatenate(
                [np.ones(len(centers)), np.zeros(pad)]
            ).astype(np.float32)
            centers += [0] * pad
            positives += [0] * pad
            yield {**self._emit(centers, positives), "mask": mask}

    def _emit(self, centers, positives):
        b = len(centers)
        if self.neg_sampler is not None:
            negs = self.neg_sampler.sample((b, self.neg_num))
        else:
            negs = self.rng.randint(0, self.vocab, (b, self.neg_num))
        return {
            "center": np.asarray(centers, np.int32),
            "pos": np.asarray(positives, np.int32),
            "negs": negs.astype(np.int32),
            "mask": np.ones(b, np.float32),
        }
