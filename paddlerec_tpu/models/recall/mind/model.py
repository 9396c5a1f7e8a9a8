"""MIND: multi-interest network with dynamic (capsule) routing.

Parity target: reference models/recall/mind/net.py:21-330 — behavior-to-
interest (B2I) dynamic routing extracts K interest capsules from the
history; label-aware attention (pow_p) picks the capsule mix for the
target; training uses sampled softmax over items (neg_samples).
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


class CapsuleRouting(nn.Module):
    """B2I dynamic routing: (B, T, E) history → (B, K, E) interests."""

    interest_num: int = 4
    routing_iters: int = 3

    @nn.compact
    def __call__(self, hist: jnp.ndarray, mask: jnp.ndarray):
        b, t, e = hist.shape
        k = self.interest_num
        s_w = self.param(
            "bilinear_w", nn.initializers.normal(1.0 / jnp.sqrt(e)), (e, e)
        )
        u_hat = jnp.einsum("bte,ef->btf", hist, s_w)  # shared bilinear map
        # fixed random logits init (paper: random init keeps capsules
        # diverse); NON-trainable — the reference stop_gradients the B2I
        # routing logits, and training them collapses capsules toward a
        # shared prior
        logits0 = jax.lax.stop_gradient(self.param(
            "routing_logits", nn.initializers.normal(1.0), (1, k, t)
        ))
        logits = jnp.broadcast_to(logits0, (b, k, t))
        neg_inf = -1e9

        caps = None
        for _ in range(self.routing_iters):
            masked = jnp.where(mask[:, None, :] > 0, logits, neg_inf)
            w = jax.nn.softmax(masked, axis=1)  # over capsules
            caps = jnp.einsum("bkt,bte->bke", w * mask[:, None, :], u_hat)
            # squash
            norm2 = jnp.sum(caps * caps, -1, keepdims=True)
            caps = caps * (norm2 / (1 + norm2)) / jnp.sqrt(norm2 + 1e-9)
            logits = logits + jnp.einsum("bke,bte->bkt", caps, u_hat)
        return caps  # (B, K, E)


class MINDNet(nn.Module):
    item_count: int
    embedding_dim: int = 64
    interest_num: int = 4
    pow_p: float = 1.0

    def setup(self):
        # setup()-created submodules so user_capsules (the recall-serving
        # entry point) is callable via apply(..., method=...) — creating
        # them inside a plain method raises AssignSubModuleError
        self.item_emb = nn.Embed(self.item_count, self.embedding_dim,
                                 name="item_emb")
        self.routing = CapsuleRouting(self.interest_num, name="routing")

    def __call__(self, hist_items, seq_mask, target_items, neg_items):
        item_emb = self.item_emb
        hist = item_emb(hist_items)  # (B, T, E)
        caps = self.routing(hist, seq_mask)

        tgt = item_emb(target_items)  # (B, E)
        att = jax.nn.softmax(
            jnp.power(
                jnp.maximum(jnp.einsum("bke,be->bk", caps, tgt), 1e-9),
                self.pow_p,
            ),
            axis=-1,
        )
        user_vec = jnp.einsum("bk,bke->be", att, caps)  # (B, E)

        pos_logit = (user_vec * tgt).sum(-1)
        neg = item_emb(neg_items)  # (B, N, E)
        neg_logit = jnp.einsum("be,bne->bn", user_vec, neg)
        return pos_logit, neg_logit, caps

    def user_capsules(self, hist_items, seq_mask):
        """Serving entry: interest capsules for ANN recall
        (apply(vars, hist, mask, method=MINDNet.user_capsules))."""
        return self.routing(self.item_emb(hist_items), seq_mask)


@register_model("recall.mind")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        self.item_count = int(config.hyper("item_count", 367983))
        self.embedding_dim = int(config.hyper("embedding_dim", 64))
        self.interest_num = int(config.hyper("interest_num", 4))
        self.neg_samples = int(config.hyper("neg_samples", 128))
        self.maxlen = int(config.hyper("maxlen", 20))
        self.module = MINDNet(
            self.item_count,
            self.embedding_dim,
            self.interest_num,
            float(config.hyper("pow_p", 1.0)),
        )

    def model_inputs(self, batch):
        return (
            batch["hist_items"],
            batch["seq_mask"],
            batch["target_items"],
            batch["neg_items"],
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        t = self.maxlen
        lens = rng.randint(1, t + 1, batch_size)
        seq_mask = (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
        return {
            "hist_items": (rng.randint(0, self.item_count, (batch_size, t))
                           * seq_mask).astype(np.int32),
            "seq_mask": seq_mask,
            "target_items": rng.randint(0, self.item_count, batch_size).astype(
                np.int32
            ),
            "neg_items": rng.randint(
                0, self.item_count, (batch_size, self.neg_samples)
            ).astype(np.int32),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        pos_logit, neg_logit, _ = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        # sampled softmax: positive vs neg_samples
        logits = jnp.concatenate([pos_logit[:, None], neg_logit], axis=1)
        logp = jax.nn.log_softmax(logits, axis=1)
        mask = batch.get("mask")
        per = -logp[:, 0]
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
        k = min(8, aux["neg_logit"].shape[1])  # subsample
        neg = jax.nn.sigmoid(aux["neg_logit"][:, :k]).reshape(-1)
        preds = jnp.concatenate([pos, neg])
        labels = jnp.concatenate([jnp.ones_like(pos), jnp.zeros_like(neg)])
        mask = aux.get("mask")
        if mask is not None:
            mask = jnp.concatenate(
                [mask, jnp.repeat(mask[:, None], k, axis=1).reshape(-1)]
            )
        return {"auc": (preds, labels, mask)}

    def make_dataset(self, data_dir: str, batch_size: int, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return MINDDataset(
            files, self.item_count, self.maxlen, self.neg_samples, batch_size
        )


class MINDDataset:
    """CSV ``user,item,timestamp`` → per-user time-sorted histories; each
    step uses the prefix as history, the next item as target (mind_reader.py
    protocol), uniform negatives."""

    def __init__(self, files, item_count, maxlen, neg_samples, batch_size,
                 seed=0):
        self.files = files
        self.item_count = item_count
        self.maxlen = maxlen
        self.neg_samples = neg_samples
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)

    def _sequences(self):
        graph = {}
        for path in self.files:
            with open(path) as f:
                for line in f:
                    parts = line.strip().split(",")
                    if len(parts) < 3:
                        continue
                    u, i, ts = int(parts[0]), int(parts[1]), int(parts[2])
                    graph.setdefault(u, []).append((ts, i))
        for u, items in graph.items():
            items.sort()
            yield [i for _, i in items]

    def __iter__(self):
        t = self.maxlen
        rows = []
        for seq in self._sequences():
            for split in range(1, len(seq)):
                hist = seq[max(0, split - t):split]
                rows.append((hist, seq[split]))
                if len(rows) == self.batch_size:
                    yield self._emit(rows)
                    rows = []
        if rows:
            yield self._emit(rows, pad_to=self.batch_size)

    def _emit(self, rows, pad_to=None):
        bs = pad_to or len(rows)
        t = self.maxlen
        hist = np.zeros((bs, t), np.int32)
        seq_mask = np.zeros((bs, t), np.float32)
        target = np.zeros((bs,), np.int32)
        mask = np.zeros((bs,), np.float32)
        for r, (h, tgt) in enumerate(rows):
            hist[r, : len(h)] = h
            seq_mask[r, : len(h)] = 1.0
            target[r] = tgt
            mask[r] = 1.0
        return {
            "hist_items": hist,
            "seq_mask": seq_mask,
            "target_items": target,
            "neg_items": self.rng.randint(
                0, self.item_count, (bs, self.neg_samples)
            ).astype(np.int32),
            "mask": mask,
        }
