"""NAML: neural news recommendation with attentive multi-view learning.

Parity target: reference models/rank/naml/net.py:22-229 —
  * news encoder: word-embedding → 1-D conv (400 ch, k=3) + additive
    attention for title and content; category/sub-category linear views;
    a mix additive attention over the 4 views → 400-d news vector;
  * user encoder: additive attention over the browsed-news vectors;
  * score: dot(user vector, candidate vectors) over 1 positive +
    ``neg_candidate_sample_size`` negatives; softmax CE with soft labels
    (dygraph_model.py:87-99); AUC over flattened candidate scores.

TPU-first: candidates and browsed news are encoded in ONE batched news-
encoder call over (B·(S+V)) news (the reference does the same reshape,
net.py:184-205).
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


class AdditiveAttention(nn.Module):
    """softmax(v·tanh-less proj(x)) pooling (net.py:148-182 make_attention_layer)."""

    proj_dim: int = 100

    @nn.compact
    def __call__(self, x):  # (B, G, D) → (B, D)
        proj = nn.Dense(
            self.proj_dim, kernel_init=nn.initializers.normal(0.01),
            name="proj",
        )(x)
        vec = self.param(
            "vec", nn.initializers.normal(0.1), (self.proj_dim, 1)
        )
        w = jax.nn.softmax((proj @ vec)[..., 0], axis=-1)  # (B, G)
        return jnp.einsum("bg,bgd->bd", w, x)


class NewsEncoder(nn.Module):
    word_dict_size: int
    word_dim: int
    category_size: int
    sub_category_size: int
    cate_dim: int
    conv_out: int = 400

    @nn.compact
    def __call__(self, category, sub_category, title, content):
        """category/sub_category (N,), title (N, Tt), content (N, Tc)."""
        word_emb = nn.Embed(
            self.word_dict_size + 1, self.word_dim, name="word2vec_embedding"
        )
        cate_v = nn.relu(
            nn.Dense(self.conv_out, name="category_linear")(
                nn.Embed(
                    self.category_size + 1, self.cate_dim, name="cate_embedding"
                )(category)
            )
        )
        sub_v = nn.relu(
            nn.Dense(self.conv_out, name="sub_category_linear")(
                nn.Embed(
                    self.sub_category_size + 1, self.cate_dim,
                    name="sub_cate_embedding",
                )(sub_category)
            )
        )
        conv = nn.Conv(self.conv_out, (3,), padding="SAME", use_bias=False,
                       name="conv_title")
        title_bias = self.param(
            "conv_title_bias", nn.initializers.normal(1.0 / self.conv_out),
            (self.conv_out,),
        )
        content_bias = self.param(
            "conv_content_bias", nn.initializers.normal(1.0 / self.conv_out),
            (self.conv_out,),
        )
        # the reference reuses conv_title for content too (net.py:44-50)
        title_v = AdditiveAttention(name="title_attention")(
            nn.relu(conv(word_emb(title)) + title_bias)
        )
        content_v = AdditiveAttention(name="content_attention")(
            nn.relu(conv(word_emb(content)) + content_bias)
        )
        views = jnp.stack([title_v, content_v, cate_v, sub_v], axis=1)
        return AdditiveAttention(name="mix_attention")(views)


class NAMLNet(nn.Module):
    word_dict_size: int
    word_dim: int
    category_size: int
    sub_category_size: int
    cate_dim: int
    sample_size: int  # 1 + negatives
    browse_size: int
    conv_out: int = 400

    def encode_all(self, cate, sub_cate, title, content):
        b, g = cate.shape
        vec = NewsEncoder(
            self.word_dict_size, self.word_dim, self.category_size,
            self.sub_category_size, self.cate_dim, self.conv_out,
            name="news_encoder",
        )(
            cate.reshape(-1), sub_cate.reshape(-1),
            title.reshape(b * g, -1), content.reshape(b * g, -1),
        )
        return vec.reshape(b, g, self.conv_out)

    @nn.compact
    def __call__(
        self, cate_sample, cate_visit, sub_cate_sample, sub_cate_visit,
        title_sample, title_visit, content_sample, content_visit,
    ):
        cate = jnp.concatenate([cate_sample, cate_visit], 1)
        sub = jnp.concatenate([sub_cate_sample, sub_cate_visit], 1)
        title = jnp.concatenate([title_sample, title_visit], 1)
        content = jnp.concatenate([content_sample, content_visit], 1)
        vecs = self.encode_all(cate, sub, title, content)
        sample_emb = vecs[:, : self.sample_size]
        visit_emb = vecs[:, self.sample_size:]
        user = AdditiveAttention(name="user_attention")(visit_emb)
        return jnp.einsum("bsd,bd->bs", sample_emb, user)  # (B, S) logits


class NewsRecModelDef(ModelDef):
    """Shared contract for NAML/Fastformer: softmax CE over candidates."""

    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        h = config.hyper
        self.title_size = int(h("article_title_size", 10))
        self.content_size = int(h("article_content_size", 30))
        self.browse_size = int(h("browse_size", 10))
        self.neg_size = int(h("neg_condidate_sample_size", 4))
        self.word_dim = int(h("word_dimension", 30))
        self.category_size = int(h("category_size", 4))
        self.sub_category_size = int(h("sub_category_size", 10))
        self.cate_dim = int(h("category_dimension", 32))
        self.word_dict_size = int(h("word_dict_size", 101))

    def model_inputs(self, batch):
        return (
            batch["cate_sample"], batch["cate_visit"],
            batch["sub_cate_sample"], batch["sub_cate_visit"],
            batch["title_sample"], batch["title_visit"],
            batch["content_sample"], batch["content_visit"],
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        s, v = self.neg_size + 1, self.browse_size

        def ids(hi, *shape):
            return rng.randint(0, hi, shape).astype(np.int64)

        labels = np.zeros((batch_size, s), np.float32)
        labels[np.arange(batch_size), rng.randint(0, s, batch_size)] = 1.0
        return {
            "cate_sample": ids(self.category_size, batch_size, s),
            "cate_visit": ids(self.category_size, batch_size, v),
            "sub_cate_sample": ids(self.sub_category_size, batch_size, s),
            "sub_cate_visit": ids(self.sub_category_size, batch_size, v),
            "title_sample": ids(self.word_dict_size, batch_size, s,
                                self.title_size),
            "title_visit": ids(self.word_dict_size, batch_size, v,
                               self.title_size),
            "content_sample": ids(self.word_dict_size, batch_size, s,
                                  self.content_size),
            "content_visit": ids(self.word_dict_size, batch_size, v,
                                 self.content_size),
            "labels": labels,
        }

    def train_forward(self, params, batch):
        logits = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )  # (B, S)
        labels = batch["labels"].astype(jnp.float32)
        per = -(labels * jax.nn.log_softmax(logits, -1)).sum(-1)
        mask = batch.get("mask")
        if mask is not None:
            loss = (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        else:
            loss = per.mean()
        aux: Aux = {
            "predictions": jax.nn.sigmoid(logits).reshape(-1),
            "labels": labels.reshape(-1),
        }
        if mask is not None:
            aux["mask"] = jnp.repeat(
                mask[:, None], logits.shape[1], 1
            ).reshape(-1)
        return loss, aux

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return NewsDataset(self, files, batch_size)


@register_model("rank.naml")
class ModelDef(NewsRecModelDef):
    def __init__(self, config: Config):
        super().__init__(config)
        self.module = NAMLNet(
            self.word_dict_size, self.word_dim, self.category_size,
            self.sub_category_size, self.cate_dim, self.neg_size + 1,
            self.browse_size,
        )


class NewsDataset:
    """Semicolon-grouped line format: ``labels;cate_sample;cate_visit;
    sub_cate_sample;sub_cate_visit;title_sample;title_visit;
    content_sample;content_visit`` — ids comma-separated, matrices
    row-major (the reference parses a pickled MIND sample of the same
    logical fields, models/rank/naml/reader.py)."""

    def __init__(self, md, files, batch_size):
        self.md = md
        self.files = files
        self.batch_size = batch_size

    def __iter__(self):
        md, bs = self.md, self.batch_size
        s, v = md.neg_size + 1, md.browse_size
        shapes = {
            "labels": (s,), "cate_sample": (s,), "cate_visit": (v,),
            "sub_cate_sample": (s,), "sub_cate_visit": (v,),
            "title_sample": (s, md.title_size),
            "title_visit": (v, md.title_size),
            "content_sample": (s, md.content_size),
            "content_visit": (v, md.content_size),
        }
        keys = list(shapes)
        buf = {k: [] for k in keys}
        n = 0
        for path in self.files:
            with open(path) as f:
                for line in f:
                    parts = line.strip().split(";")
                    if len(parts) != len(keys):
                        continue
                    for k, p in zip(keys, parts):
                        vals = np.asarray(
                            [float(x) for x in p.split(",")]
                        ).reshape(shapes[k])
                        buf[k].append(vals)
                    n += 1
                    if n == bs:
                        yield self._emit(buf)
                        buf = {k: [] for k in keys}
                        n = 0
        if n:
            # pad the tail to the static batch (unpadded tails force a
            # recompile per epoch and desync multi-host collectives);
            # padded rows carry mask 0
            yield self._emit(buf, pad_to=bs, valid=n)

    @staticmethod
    def _emit(buf, pad_to=None, valid=None):
        out = {}
        for k, vals in buf.items():
            arr = np.stack(vals)
            if pad_to is not None and len(arr) < pad_to:
                pad = np.zeros((pad_to - len(arr),) + arr.shape[1:],
                               arr.dtype)
                arr = np.concatenate([arr, pad])
            out[k] = (
                arr.astype(np.float32) if k == "labels"
                else arr.astype(np.int64)
            )
        n_rows = len(next(iter(out.values())))
        out["mask"] = (
            np.arange(n_rows) < (valid if valid is not None else n_rows)
        ).astype(np.float32)
        return out
