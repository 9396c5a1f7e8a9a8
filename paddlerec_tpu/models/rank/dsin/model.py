"""DSIN: Deep Session Interest Network (Alimama display-ad CTR).

Parity target: reference models/rank/dsin/net.py:23-349 —
  * 15 profile/ad/context sparse fields, each its own vocab, embed dim 4;
    cate/brand embeddings shared with the session sequences;
  * session-interest extractor: per session (5 sessions × length 10),
    sinusoidal positional encoding + one transformer encoder layer
    (d_model 8, 8 heads, ffn 64), mean-pooled over time (net.py:316-329);
  * session-interest interacting: 2-layer BiLSTM over the 5 session
    vectors, fwd/bwd halves averaged (net.py:330-332);
  * session-interest activating: DIN-style attention pooling of both the
    transformer features and the LSTM features against the ad's
    cate+brand query, softmax-normalized (sequence_layers.py:46-110);
  * MLP [77→200→80]→1 over [profile embs, pooled interests, price].

TPU-first: both per-session transformers run as ONE batched call over a
(B·sess_count, len) layout instead of a Python loop over sessions; the
BiLSTM is a lax.scan over the 5-step session axis.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.data.slot_reader import list_data_files, shard_files
from paddlerec_tpu.models.base import Aux, ModelDef, binary_logloss
from paddlerec_tpu.ops.layers import MLP, TargetAttention
from paddlerec_tpu.ops.sequence import (
    BiLSTM,
    TransformerBlock,
    sinusoidal_position_encoding,
)

# sparse_input column order (net.py:255-269)
FIELDS = (
    "user", "adgroup", "pid", "cms_segid", "cms_group", "gender", "age",
    "pvalue", "shopping", "occupation", "new_user_class", "campaign",
    "customer", "cate", "brand",
)


class DSINNet(nn.Module):
    vocab_sizes: Tuple[int, ...]  # per FIELDS order
    embed_dim: int = 4
    att_embedding_size: int = 8
    sess_count: int = 5
    sess_max_length: int = 10

    @nn.compact
    def __call__(self, sparse, price, sess_input, sess_length):
        """sparse (B,15) int; price (B,); sess_input (B, 2·sess_count, len)
        with rows [cate_s0, brand_s0? — reference interleaves: rows ::2 are
        cate, rows 1::2 brand (net.py:309-310)]; sess_length (B,) sessions."""
        e = self.embed_dim
        embeds = {
            name: nn.Embed(v, e, name=f"{name}_emb")
            for name, v in zip(FIELDS, self.vocab_sizes)
        }
        field_embs = [
            embeds[name](sparse[:, i]) for i, name in enumerate(FIELDS)
        ]
        deep_input = jnp.concatenate(field_embs, axis=-1)  # (B, 60)
        query = jnp.concatenate(
            [field_embs[FIELDS.index("cate")], field_embs[FIELDS.index("brand")]],
            axis=-1,
        )  # (B, 8)

        cate_sess = embeds["cate"](sess_input[:, ::2, :])  # (B, S, L, 4)
        brand_sess = embeds["brand"](sess_input[:, 1::2, :])
        tr_input = jnp.concatenate([cate_sess, brand_sess], -1)  # (B,S,L,8)

        b, s, L, d = tr_input.shape
        # ONE transformer call over all sessions: (B·S, L, 8).
        # Pad positions (id 0 within a session) must not attend or pool —
        # derive the key mask from the cate ids of each event
        pos_mask = (sess_input[:, ::2, :] > 0).astype(tr_input.dtype)
        flat = tr_input.reshape(b * s, L, d)
        flat_mask = pos_mask.reshape(b * s, L)
        flat = flat + sinusoidal_position_encoding(L, d)[None]
        flat = TransformerBlock(
            num_heads=8,
            head_dim=max(self.att_embedding_size // 8, 1),
            ffn_dim=64,
            name="sess_transformer",
        )(flat, flat_mask)
        denom = jnp.maximum(flat_mask.sum(-1, keepdims=True), 1.0)
        sess_fea = (
            (flat * flat_mask[..., None]).sum(axis=1) / denom
        ).reshape(b, s, d)  # (B, S, 8) masked mean

        sess_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
            < sess_length[:, None]
        ).astype(flat.dtype)
        lstm_out = BiLSTM(d, num_layers=2, name="bilstm")(sess_fea, sess_mask)
        lstm_out = (lstm_out[..., :d] + lstm_out[..., d:]) / 2  # (B, S, 8)
        att_tr = TargetAttention(
            hidden_sizes=(64, 16), use_softmax=True, name="tr_actpool"
        )(sess_fea, query, sess_mask)
        att_lstm = TargetAttention(
            hidden_sizes=(64, 16), use_softmax=True, name="lstm_actpool"
        )(lstm_out, query, sess_mask)

        mlp_in = jnp.concatenate(
            [deep_input, att_tr, att_lstm, price[:, None]], axis=-1
        )
        hidden = MLP([200, 80], name="mlp")(mlp_in)
        return nn.Dense(1, name="head")(hidden)[:, 0]


@register_model("rank.dsin")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        h = config.hyper
        self.vocab_sizes = tuple(
            int(h(k, d))
            for k, d in (
                ("user_size", 265442), ("adgroup_size", 512431),
                ("pid_size", 2), ("cms_segid_size", 97),
                ("cms_group_size", 13), ("final_gender_size", 2),
                ("age_level_size", 7), ("pvalue_level_size", 4),
                ("shopping_level_size", 3), ("occupation_size", 2),
                ("new_user_class_level_size", 5), ("campaign_size", 309448),
                ("customer_size", 195841), ("cate_size", 12974),
                ("brand_size", 461499),
            )
        )
        self.sess_count = int(h("sess_count", 5))
        self.sess_max_length = int(h("sess_max_length", 10))
        self.module = DSINNet(
            self.vocab_sizes,
            int(h("feat_embed_size", 4)),
            int(h("att_embedding_size", 8)),
            self.sess_count,
            self.sess_max_length,
        )

    def model_inputs(self, batch):
        return (
            batch["sparse"], batch["price"], batch["sess_input"],
            batch["sess_length"],
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        sparse = np.stack(
            [rng.randint(0, v, batch_size) for v in self.vocab_sizes], axis=1
        ).astype(np.int64)
        return {
            "sparse": sparse,
            "price": rng.rand(batch_size).astype(np.float32),
            "sess_input": rng.randint(
                0,
                min(self.vocab_sizes[13], self.vocab_sizes[14]),
                (batch_size, 2 * self.sess_count, self.sess_max_length),
            ).astype(np.int64),
            "sess_length": rng.randint(1, self.sess_count + 1, batch_size
                                       ).astype(np.int32),
            "label": (rng.rand(batch_size) < 0.5).astype(np.float32),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        logits = self.module.apply({"params": params}, *self.model_inputs(batch))
        labels = batch["label"].reshape(-1).astype(jnp.float32)
        mask = batch.get("mask")
        loss = binary_logloss(logits, labels, mask)
        aux: Aux = {"predictions": jax.nn.sigmoid(logits), "labels": labels}
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return DSINDataset(
            files, batch_size, self.sess_count, self.sess_max_length
        )


class DSINDataset:
    """Text lines: ``label;15 sparse ids;price;sess ids (2S·L,
    comma-separated);sess_length`` (the reference reads a pickled
    DataFrame of the same fields, models/rank/dsin/reader.py)."""

    def __init__(self, files, batch_size, sess_count, sess_max_length):
        self.files = files
        self.batch_size = batch_size
        self.rows = 2 * sess_count
        self.cols = sess_max_length

    def __iter__(self):
        bs = self.batch_size
        buf = []
        for path in self.files:
            with open(path) as f:
                for line in f:
                    parts = line.strip().split(";")
                    if len(parts) < 5:
                        continue
                    buf.append(parts)
                    if len(buf) == bs:
                        yield self._batch(buf)
                        buf = []
        if buf:
            # zero-pad the tail to the full batch (mask marks real rows)
            # so every batch keeps ONE static shape — no tail recompile,
            # and dp sharding over the batch axis stays divisible
            yield self._batch(buf, pad_to=bs)

    def _batch(self, rows, pad_to=None):
        n = pad_to or len(rows)
        sparse = np.zeros((n, 15), np.int64)
        price = np.zeros((n,), np.float32)
        sess = np.zeros((n, self.rows, self.cols), np.int64)
        sess_len = np.zeros((n,), np.int32)
        label = np.zeros((n,), np.float32)
        valid = len(rows)
        for i, p in enumerate(rows):
            label[i] = float(p[0])
            sp = [int(v) for v in p[1].split(",")][:15]
            sparse[i, : len(sp)] = sp  # short rows: zero-pad, don't crash
            price[i] = float(p[2])
            ids = [int(v) for v in p[3].split(",")][: self.rows * self.cols]
            ids = ids + [0] * (self.rows * self.cols - len(ids))
            sess[i] = np.asarray(ids).reshape(self.rows, self.cols)
            sess_len[i] = int(p[4])
        mask = np.zeros(n, np.float32)
        mask[:valid] = 1.0
        return {
            "sparse": sparse, "price": price, "sess_input": sess,
            "sess_length": sess_len, "label": label, "mask": mask,
        }
