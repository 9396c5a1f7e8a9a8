"""Movie-recommend demo: the two-stage recall → rank pipeline.

Parity target: reference models/demo/movie_recommand/ —
  * recall (recall/net.py:22-102): shared 9-d embedding over user fields
    (uid, gender, age, occupation) and movie fields (mid, title tokens
    sum-pooled, genres sum-pooled); two [512,256,128,32] towers; score =
    5 · cosine(user, movie); MSE against the 1-5 rating;
  * rank (rank/net.py): same features through one concatenated DNN;
  * pipeline (README): export user/movie vectors → ANN recall top-k
    (Milvus in the reference; exact MXU dot-product top-k here) →
    rank → final ordering.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import ModelDef

USER_FIELDS = 4  # uid, gender, age, occupation
MOVIE_SPARSE = 1  # mid
TITLE_LEN = 8
GENRE_LEN = 4


class TwoTower(nn.Module):
    vocab: int
    dim: int = 9
    fc_sizes: Sequence[int] = (512, 256, 128, 32)

    def setup(self):
        self.emb = nn.Embed(self.vocab, self.dim, name="SparseFeatFactors")
        self.user_fcs = [
            nn.Dense(d, name=f"user_fc{i}")
            for i, d in enumerate(self.fc_sizes)
        ]
        self.movie_fcs = [
            nn.Dense(d, name=f"movie_fc{i}")
            for i, d in enumerate(self.fc_sizes)
        ]

    def towers(self, user_sparse, movie_id, title, genres, title_mask,
               genre_mask):
        user = self.emb(user_sparse).reshape(user_sparse.shape[0], -1)
        mid = self.emb(movie_id)
        ttl = (self.emb(title) * title_mask[..., None]).sum(1)
        gnr = (self.emb(genres) * genre_mask[..., None]).sum(1)
        movie = jnp.concatenate([mid, ttl, gnr], -1)  # (B, 27)
        for ufc, mfc in zip(self.user_fcs, self.movie_fcs):
            user = nn.relu(ufc(user))
            movie = nn.relu(mfc(movie))
        return user, movie

    def __call__(self, user_sparse, movie_id, title, genres, title_mask,
                 genre_mask):
        user, movie = self.towers(
            user_sparse, movie_id, title, genres, title_mask, genre_mask
        )
        un = user * jax.lax.rsqrt((user**2).sum(-1, keepdims=True) + 1e-12)
        mn = movie * jax.lax.rsqrt((movie**2).sum(-1, keepdims=True) + 1e-12)
        return 5.0 * (un * mn).sum(-1)  # rating prediction


class RankDNN(nn.Module):
    vocab: int
    dim: int = 9
    fc_sizes: Sequence[int] = (512, 256, 128, 32)

    @nn.compact
    def __call__(self, user_sparse, movie_id, title, genres, title_mask,
                 genre_mask):
        emb = nn.Embed(self.vocab, self.dim, name="SparseFeatFactors")
        user = emb(user_sparse).reshape(user_sparse.shape[0], -1)
        mid = emb(movie_id)
        ttl = (emb(title) * title_mask[..., None]).sum(1)
        gnr = (emb(genres) * genre_mask[..., None]).sum(1)
        feat = jnp.concatenate([user, mid, ttl, gnr], -1)
        h = feat
        for i, d in enumerate(self.fc_sizes):
            h = nn.relu(nn.Dense(d, name=f"fc{i}")(h))
        return nn.Dense(1, name="out")(h)[:, 0] + 2.5  # centered rating


class _MovieModelDef(ModelDef):
    metrics = "none"
    metric_names = ()

    def __init__(self, config: Config):
        super().__init__(config)
        self.vocab = int(config.hyper("sparse_feature_number", 600000))
        self.dim = int(config.hyper("sparse_feature_dim", 9))
        self.fc_sizes = tuple(
            int(x) for x in config.hyper("fc_sizes", [512, 256, 128, 32])
        )

    def model_inputs(self, batch):
        return (
            batch["user_sparse"], batch["movie_id"], batch["title"],
            batch["genres"], batch["title_mask"], batch["genre_mask"],
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        return {
            "user_sparse": rng.randint(
                1, self.vocab, (batch_size, USER_FIELDS)
            ).astype(np.int64),
            "movie_id": rng.randint(1, self.vocab, batch_size).astype(np.int64),
            "title": rng.randint(1, self.vocab, (batch_size, TITLE_LEN)
                                 ).astype(np.int64),
            "genres": rng.randint(1, self.vocab, (batch_size, GENRE_LEN)
                                  ).astype(np.int64),
            "title_mask": np.ones((batch_size, TITLE_LEN), np.float32),
            "genre_mask": np.ones((batch_size, GENRE_LEN), np.float32),
            "label": rng.randint(1, 6, batch_size).astype(np.float32),
        }

    def train_forward(self, params, batch):
        pred = self.module.apply({"params": params}, *self.model_inputs(batch))
        label = batch["label"].astype(jnp.float32)
        loss = jnp.mean(jnp.square(pred - label))
        return loss, {"predictions": pred, "labels": label}


@register_model("demo.movie_recall")
class RecallModelDef(_MovieModelDef):
    def __init__(self, config: Config):
        super().__init__(config)
        self.module = TwoTower(self.vocab, self.dim, self.fc_sizes)

    def user_vector(self, params, batch):
        user, _ = self.module.apply(
            {"params": params}, *self.model_inputs(batch),
            method=TwoTower.towers,
        )
        return user

    def movie_vector(self, params, batch):
        _, movie = self.module.apply(
            {"params": params}, *self.model_inputs(batch),
            method=TwoTower.towers,
        )
        return movie


@register_model("demo.movie_rank")
class RankModelDef(_MovieModelDef):
    def __init__(self, config: Config):
        super().__init__(config)
        self.module = RankDNN(self.vocab, self.dim, self.fc_sizes)


def ann_topk(user_vecs: np.ndarray, movie_vecs: np.ndarray, k: int):
    """Exact cosine top-k — the Milvus-recall analog (one MXU matmul)."""
    u = jnp.asarray(user_vecs)
    m = jnp.asarray(movie_vecs)
    u = u * jax.lax.rsqrt((u**2).sum(-1, keepdims=True) + 1e-12)
    m = m * jax.lax.rsqrt((m**2).sum(-1, keepdims=True) + 1e-12)
    scores = u @ m.T
    # clamp like VectorIndex.search: k beyond the catalog crashes top_k
    vals, idx = jax.lax.top_k(scores, min(k, m.shape[0]))
    return np.asarray(vals), np.asarray(idx)
