"""BERT4Rec: bidirectional transformer for sequential recommendation.

Parity target: reference models/rank/bert4rec/net.py:25-137 — BERT over an
item-id sequence: word+position+sentence embeddings, pre-encoder layer
norm, N post-norm transformer layers with a (mask·maskᵀ) attention bias,
masked-position feature gather → transform → layernorm → logits tied to
the item embedding table plus an output bias; loss is softmax CE on the
masked positions (dygraph_model.py:77-81).

TPU-first: mask positions are a static-shape (B, M) per-example index
matrix with a validity mask (the reference flattens to dynamic-length
gathers, net.py:122-125 — dynamic shapes don't jit); logits are one MXU
matmul against the tied embedding.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.data.slot_reader import list_data_files, shard_files
from paddlerec_tpu.models.base import AccuracyModelDef, Aux
from paddlerec_tpu.ops.sequence import TransformerBlock


class Bert4RecNet(nn.Module):
    voc_size: int
    emb_size: int = 64
    n_layer: int = 2
    n_head: int = 2
    max_position: int = 50
    sent_types: int = 2

    @nn.compact
    def __call__(self, src_ids, pos_ids, sent_ids, input_mask, mask_pos):
        """src/pos/sent ids (B, T); input_mask (B, T) 1=real token;
        mask_pos (B, M) per-example positions of [MASK] tokens."""
        word_emb = nn.Embed(
            self.voc_size, self.emb_size,
            embedding_init=nn.initializers.truncated_normal(0.02),
            name="word_embedding",
        )
        x = (
            word_emb(src_ids)
            + nn.Embed(self.max_position, self.emb_size,
                       name="pos_embedding")(pos_ids)
            + nn.Embed(self.sent_types, self.emb_size,
                       name="sent_embedding")(sent_ids)
        )
        x = nn.LayerNorm(name="pre_encoder_ln")(x)
        for i in range(self.n_layer):
            x = TransformerBlock(
                self.n_head, self.emb_size // self.n_head, 4 * self.emb_size,
                ffn_activation="gelu",  # reference hidden_act (config.yaml)
                name=f"encoder_layer_{i}",
            )(x, input_mask)
        # gather masked positions: (B, M, D)
        feat = jnp.take_along_axis(x, mask_pos[..., None], axis=1)
        feat = nn.gelu(nn.Dense(self.emb_size, name="mask_lm_trans_fc")(feat))
        feat = nn.LayerNorm(name="mask_lm_trans_ln")(feat)
        bias = self.param(
            "mask_lm_out_bias", nn.initializers.zeros, (self.voc_size,)
        )
        return word_emb.attend(feat) + bias  # (B, M, V)


@register_model("rank.bert4rec")
class ModelDef(AccuracyModelDef):
    metric_names = ("acc",)

    def __init__(self, config: Config):
        super().__init__(config)
        h = config.hyper
        self.voc_size = int(h("_voc_size", 54546))
        self.max_position = int(h("_max_position_seq_len", 50))
        self.max_mask = int(h("max_mask_per_seq", 10))
        self.module = Bert4RecNet(
            self.voc_size,
            int(h("_emb_size", 64)),
            int(h("_n_layer", 2)),
            int(h("_n_head", 2)),
            self.max_position,
            int(h("_sent_types", 2)),
        )

    def model_inputs(self, batch):
        return (
            batch["src_ids"], batch["pos_ids"], batch["sent_ids"],
            batch["input_mask"], batch["mask_pos"],
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        t, m = self.max_position, self.max_mask
        return {
            "src_ids": rng.randint(0, self.voc_size, (batch_size, t)
                                   ).astype(np.int32),
            "pos_ids": np.tile(np.arange(t, dtype=np.int32), (batch_size, 1)),
            "sent_ids": np.zeros((batch_size, t), np.int32),
            "input_mask": np.ones((batch_size, t), np.float32),
            "mask_pos": rng.randint(0, t, (batch_size, m)).astype(np.int32),
            "mask_label": rng.randint(0, self.voc_size, (batch_size, m)
                                      ).astype(np.int32),
            "mask_weight": np.ones((batch_size, m), np.float32),
        }

    def train_forward(self, params, batch):
        logits = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )  # (B, M, V)
        labels = batch["mask_label"]
        w = batch["mask_weight"].astype(jnp.float32)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        loss = (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
        correct = (logits.argmax(-1) == labels).astype(jnp.float32)
        aux: Aux = {
            "correct": correct.reshape(-1),
            "mask_weight": w.reshape(-1),
        }
        return loss, aux

    def metric_updates(self, aux):
        return {"acc": (aux["correct"], aux["mask_weight"])}

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return Bert4RecDataset(
            files, batch_size, self.max_position, self.max_mask,
            self.voc_size,
        )


class Bert4RecDataset:
    """Item-sequence lines ``uid item1 item2 ...``; masking follows the
    cloze protocol of the reference's data_reader (random positions →
    [MASK]=voc_size−1)."""

    def __init__(self, files, batch_size, max_len, max_mask, voc_size,
                 mask_prob=0.15, seed=2023):
        self.files = files
        self.batch_size = batch_size
        self.max_len = max_len
        self.max_mask = max_mask
        self.voc_size = voc_size
        self.mask_prob = mask_prob
        self.rng = np.random.RandomState(seed)

    def __iter__(self):
        bs, t, m = self.batch_size, self.max_len, self.max_mask
        mask_id = self.voc_size - 1
        buf = []
        for path in self.files:
            with open(path) as f:
                for line in f:
                    items = [int(x) for x in line.split()[1:]][-t:]
                    if len(items) < 2:
                        continue
                    buf.append(items)
                    if len(buf) == bs:
                        yield self._batch(buf, t, m, mask_id)
                        buf = []
        if buf:
            # pad the tail to the static batch (padded rows carry zero
            # mask_weight, so loss and metrics ignore them)
            yield self._batch(buf, t, m, mask_id, pad_to=self.batch_size)

    def _batch(self, seqs, t, m, mask_id, pad_to=None):
        n = pad_to or len(seqs)
        src = np.zeros((n, t), np.int32)
        imask = np.zeros((n, t), np.float32)
        mpos = np.zeros((n, m), np.int32)
        mlab = np.zeros((n, m), np.int32)
        mw = np.zeros((n, m), np.float32)
        for i, items in enumerate(seqs):
            L = len(items)
            src[i, :L] = items
            imask[i, :L] = 1.0
            k = max(1, min(m, int(L * self.mask_prob)))
            pos = self.rng.choice(L, k, replace=False)
            mlab[i, :k] = src[i, pos]
            src[i, pos] = mask_id
            mpos[i, :k] = pos
            mw[i, :k] = 1.0
        return {
            "src_ids": src,
            "pos_ids": np.tile(np.arange(t, dtype=np.int32), (n, 1)),
            "sent_ids": np.zeros((n, t), np.int32),
            "input_mask": imask,
            "mask_pos": mpos,
            "mask_label": mlab,
            "mask_weight": mw,
        }
