"""TiSASRec: time-interval-aware self-attention for sequential
recommendation.

Parity target: reference models/recall/tisas/net.py:26-309 —
  * item embedding scaled by √d with absolute-position K/V embeddings
    and a personalized (T, T) time-interval matrix embedded separately
    for K and V (net.py:244-258);
  * attention score = QKᵀ + Q·abs_pos_Kᵀ + time_K·Q (net.py:120-126),
    causal + padding masked, output = A·V + A·abs_pos_V + A·time_V;
  * pre-norm blocks with 1×1-conv feed-forward (net.py:26-55);
  * training: per-position positive/negative logits (net.py:305-309)
    with BCE on valid positions; inference scores candidate items
    against the final position's feature.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import ModelDef

NEG = -(2.0**31)


class TimeAwareAttention(nn.Module):
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, q_in, kv_in, pad_mask, time_k, time_v, pos_k, pos_v):
        """q_in/kv_in (B,T,D); pad_mask (B,T) 1=valid; time_k/time_v
        (B,T,T,D); pos_k/pos_v (B,T,D)."""
        b, t, d = q_in.shape
        h, hd = self.heads, self.hidden // self.heads
        q = nn.Dense(d, name="q")(q_in)
        k = nn.Dense(d, name="k")(kv_in)
        v = nn.Dense(d, name="v")(kv_in)

        def split(x):  # (B,T,D) → (B,H,T,hd)
            return x.reshape(b, t, h, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        pkh, pvh = split(pos_k), split(pos_v)
        tkh = time_k.reshape(b, t, t, h, hd).transpose(0, 3, 1, 2, 4)
        tvh = time_v.reshape(b, t, t, h, hd).transpose(0, 3, 1, 2, 4)

        scores = (
            jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
            + jnp.einsum("bhqd,bhkd->bhqk", qh, pkh)
            + jnp.einsum("bhqkd,bhqd->bhqk", tkh, qh)
        ) / hd**0.5
        causal = jnp.tril(jnp.ones((t, t)))
        valid = pad_mask[:, None, None, :] * causal[None, None]
        scores = jnp.where(valid > 0, scores, NEG)
        att = jax.nn.softmax(scores, -1)
        out = (
            jnp.einsum("bhqk,bhkd->bhqd", att, vh)
            + jnp.einsum("bhqk,bhkd->bhqd", att, pvh)
            + jnp.einsum("bhqk,bhqkd->bhqd", att, tvh)
        )
        return out.transpose(0, 2, 1, 3).reshape(b, t, d)


class TiSASRecNet(nn.Module):
    item_num: int
    hidden: int = 50
    maxlen: int = 50
    time_span: int = 256
    num_blocks: int = 2
    num_heads: int = 1

    def seq2feats(self, log_seqs, time_matrices):
        d = self.hidden
        item_emb = nn.Embed(self.item_num + 1, d, name="item_emb")
        x = item_emb(log_seqs) * d**0.5
        b, t = log_seqs.shape
        positions = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
        pos_k = nn.Embed(self.maxlen, d, name="abs_pos_K_emb")(positions)
        pos_v = nn.Embed(self.maxlen, d, name="abs_pos_V_emb")(positions)
        tm = jnp.clip(time_matrices, 0, self.time_span)
        time_k = nn.Embed(self.time_span + 1, d, name="time_matrix_K_emb")(tm)
        time_v = nn.Embed(self.time_span + 1, d, name="time_matrix_V_emb")(tm)
        pad = (log_seqs != 0).astype(x.dtype)
        x = x * pad[..., None]
        for i in range(self.num_blocks):
            q = nn.LayerNorm(epsilon=1e-8, name=f"att_ln_{i}")(x)
            x = q + TimeAwareAttention(
                d, self.num_heads, name=f"att_{i}"
            )(q, x, pad, time_k, time_v, pos_k, pos_v)
            x = nn.LayerNorm(epsilon=1e-8, name=f"ffn_ln_{i}")(x)
            ff = nn.Dense(d, name=f"ffn_{i}_2")(
                nn.relu(nn.Dense(d, name=f"ffn_{i}_1")(x))
            )
            x = (x + ff) * pad[..., None]
        return nn.LayerNorm(epsilon=1e-8, name="last_ln")(x), item_emb

    @nn.compact
    def __call__(self, log_seqs, time_matrices, pos_seqs=None, neg_seqs=None,
                 item_indices=None):
        feats, item_emb = self.seq2feats(log_seqs, time_matrices)
        if item_indices is not None:
            final = feats[:, -1, :]
            cand = item_emb(item_indices)  # (B, I, D)
            return jnp.einsum("bid,bd->bi", cand, final)
        pos_logits = (feats * item_emb(pos_seqs)).sum(-1)
        neg_logits = (feats * item_emb(neg_seqs)).sum(-1)
        return pos_logits, neg_logits


@register_model("recall.tisas")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        h = config.hyper
        self.item_num = int(h("item_num", 3417))
        self.maxlen = int(h("maxlen", 50))
        self.time_span = int(h("time_span", 256))
        self.module = TiSASRecNet(
            self.item_num,
            int(h("hidden_units", 50)),
            self.maxlen,
            self.time_span,
            int(h("num_blocks", 2)),
            int(h("num_heads", 1)),
        )

    def model_inputs(self, batch):
        return (
            batch["log_seqs"], batch["time_matrices"], batch["pos_seqs"],
            batch["neg_seqs"],
        )

    def init_with_batch(self, rng, batch):
        return self.module.init(rng, *self.model_inputs(batch))["params"]

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        t = self.maxlen
        seqs = rng.randint(1, self.item_num + 1, (batch_size, t))
        seqs[:, : t // 2] = 0  # left-padded histories
        times = rng.randint(0, self.time_span, (batch_size, t, t))
        return {
            "log_seqs": seqs.astype(np.int64),
            "time_matrices": times.astype(np.int64),
            "pos_seqs": rng.randint(1, self.item_num + 1, (batch_size, t)
                                    ).astype(np.int64),
            "neg_seqs": rng.randint(1, self.item_num + 1, (batch_size, t)
                                    ).astype(np.int64),
        }

    def train_forward(self, params, batch):
        pos_logits, neg_logits = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        valid = (batch["pos_seqs"] != 0).astype(jnp.float32)
        n = jnp.maximum(valid.sum(), 1.0)
        loss = (
            (
                optax.sigmoid_binary_cross_entropy(
                    pos_logits, jnp.ones_like(pos_logits)
                )
                + optax.sigmoid_binary_cross_entropy(
                    neg_logits, jnp.zeros_like(neg_logits)
                )
            )
            * valid
        ).sum() / n
        preds = jnp.concatenate(
            [jax.nn.sigmoid(pos_logits), jax.nn.sigmoid(neg_logits)]
        ).reshape(-1)
        labels = jnp.concatenate(
            [jnp.ones_like(pos_logits), jnp.zeros_like(neg_logits)]
        ).reshape(-1)
        mask = jnp.concatenate([valid, valid]).reshape(-1)
        return loss, {"predictions": preds, "labels": labels, "mask": mask}

    def score_items(self, params, log_seqs, time_matrices, item_indices):
        """Inference path: candidate scores from the last position."""
        return self.module.apply(
            {"params": params}, log_seqs, time_matrices,
            item_indices=item_indices,
        )

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        from paddlerec_tpu.data.slot_reader import list_data_files

        return TiSASDataset(
            list_data_files(data_dir), self.item_num, self.maxlen,
            self.time_span, batch_size,
        )


class TiSASDataset:
    """TSV ``user item rating timestamp`` (the reference movielens_reader
    format, models/recall/tisas/data/sample_data).  Interactions are
    grouped per user in time order; each row emits the left-padded item
    history, the next-item positives, uniform negatives guaranteed != pos,
    and the personalized time-relation matrix
    ``clip(|t_i - t_j| / min_gap, time_span - 1)`` (TiSASRec's
    computeRePos)."""

    def __init__(self, files, item_num, maxlen, time_span, batch_size,
                 seed=2023):
        self.files = list(files)
        self.item_num = item_num
        self.maxlen = maxlen
        self.time_span = time_span
        self.batch_size = batch_size
        self.seed = seed

    def _row(self, events, rng):
        t = self.maxlen
        events.sort()
        seq = [(it % self.item_num) + 1 for _, it in events]
        ts = [e[0] for e in events]
        seq, ts = seq[-(t + 1):], ts[-(t + 1):]
        log = np.zeros(t, np.int64)
        pos = np.zeros(t, np.int64)
        tvec = np.full(t, ts[0], np.int64)
        n = len(seq) - 1
        log[t - n:] = seq[:-1]
        pos[t - n:] = seq[1:]
        tvec[t - n:] = ts[:-1]
        gaps = np.diff(sorted(set(ts)))
        min_gap = int(gaps.min()) if len(gaps) else 1
        rel = np.abs(tvec[:, None] - tvec[None, :]) // max(min_gap, 1)
        tmat = np.clip(rel, 0, self.time_span - 1).astype(np.int64)
        neg = np.where(
            pos > 0,
            ((pos - 1 + rng.randint(1, self.item_num, t)) % self.item_num)
            + 1,
            0,
        ).astype(np.int64)
        return log, tmat, pos, neg

    def __iter__(self):
        rng = np.random.RandomState(self.seed)
        by_user = {}
        for path in self.files:
            with open(path) as f:
                for line in f:
                    toks = line.split()
                    if len(toks) < 4:
                        continue
                    by_user.setdefault(toks[0], []).append(
                        (int(float(toks[3])), int(toks[1]))
                    )
        buf = []
        for user in sorted(by_user):
            if len(by_user[user]) < 2:
                continue
            buf.append(self._row(by_user[user], rng))
            if len(buf) == self.batch_size:
                yield self._batch(buf)
                buf = []
        if buf:
            yield self._batch(buf)

    def _batch(self, rows):
        log, tmat, pos, neg = (np.stack(x) for x in zip(*rows))
        return {
            "log_seqs": log, "time_matrices": tmat,
            "pos_seqs": pos, "neg_seqs": neg,
        }
