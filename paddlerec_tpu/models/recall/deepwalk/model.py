"""DeepWalk: random-walk skip-gram node embeddings.

Parity target: reference models/recall/deepwalk/net.py —
  * SkipGramLayer (net.py:24-95): shared node-embedding table, positive
    dst + ``neg_num`` sampled negatives, mean BCE-with-logits on the two
    halves;
  * MultiClassLayer (net.py:98-115): frozen-embedding linear probe for
    the BlogCatalog MacroF1 eval;
  * the walk generator itself (random walks over the edge list) lives in
    the reference's dataset tooling — reproduced host-side in
    WalkPairDataset.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.data.slot_reader import list_data_files, shard_files
from paddlerec_tpu.models.base import ModelDef


class SkipGramNet(nn.Module):
    num_nodes: int
    embed_size: int = 16

    @nn.compact
    def __call__(self, src, dsts):
        emb = nn.Embed(
            self.num_nodes, self.embed_size,
            embedding_init=lambda k, s, d=jnp.float32: jax.random.uniform(
                k, s, d, -1.0, 1.0
            ),  # U(-1, 1), net.py:39
            name="node_embedding",
        )
        src_e = emb(src)  # (B, E)
        dst_e = emb(dsts)  # (B, 1+neg, E)
        return jnp.einsum("be,bne->bn", src_e, dst_e)  # logits


@register_model("recall.deepwalk")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        self.num_nodes = int(config.hyper("num_nodes", 10312))
        self.neg_num = int(config.hyper("neg_num", 5))
        self.walk_len = int(config.hyper("walk_len", 40))
        self.win_size = int(config.hyper("win_size", 5))
        self.module = SkipGramNet(
            self.num_nodes, int(config.hyper("embed_size", 16))
        )

    def model_inputs(self, batch):
        return (batch["src"], batch["dsts"])

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        return {
            "src": rng.randint(0, self.num_nodes, batch_size).astype(np.int64),
            "dsts": rng.randint(
                0, self.num_nodes, (batch_size, 1 + self.neg_num)
            ).astype(np.int64),
        }

    def train_forward(self, params, batch):
        logits = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        pos, neg = logits[:, :1], logits[:, 1:]
        pos_loss = optax.sigmoid_binary_cross_entropy(
            pos, jnp.ones_like(pos)
        ).mean()
        neg_loss = optax.sigmoid_binary_cross_entropy(
            neg, jnp.zeros_like(neg)
        ).mean()
        loss = (pos_loss + neg_loss) / 2
        preds = jax.nn.sigmoid(logits).reshape(-1)
        labels = jnp.concatenate(
            [jnp.ones_like(pos), jnp.zeros_like(neg)], axis=1
        ).reshape(-1)
        return loss, {"predictions": preds, "labels": labels}

    def node_embeddings(self, params) -> np.ndarray:
        return np.asarray(params["node_embedding"]["embedding"])

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return WalkPairDataset(
            files, self, batch_size,
            seed=int(self.config.runner("seed", 2023)),
        )


class WalkPairDataset:
    """Edge-list files (``src dst`` per line) → random walks →
    (center, context) skip-gram pairs with uniform negative sampling
    (the reference delegates walks to PGL's graph tooling)."""

    def __init__(self, files, md, batch_size, walks_per_node=2, seed=2023):
        self.files = files
        self.md = md
        self.batch_size = batch_size
        self.walks_per_node = walks_per_node
        self.seed = seed

    def _adjacency(self):
        adj = {}
        for path in self.files:
            with open(path) as f:
                for line in f:
                    toks = line.split()
                    if len(toks) < 2:
                        continue
                    a, b = int(toks[0]), int(toks[1])
                    adj.setdefault(a, []).append(b)
                    adj.setdefault(b, []).append(a)
        return adj

    def __iter__(self):
        md = self.md
        rng = np.random.RandomState(self.seed)
        adj = self._adjacency()
        if not adj:
            return
        nodes = list(adj)
        src_buf, dst_buf = [], []
        for _ in range(self.walks_per_node):
            rng.shuffle(nodes)
            for start in nodes:
                walk = [start]
                for _ in range(md.walk_len - 1):
                    nbrs = adj.get(walk[-1])
                    if not nbrs:
                        break
                    walk.append(nbrs[rng.randint(len(nbrs))])
                for i, center in enumerate(walk):
                    lo = max(0, i - md.win_size)
                    hi = min(len(walk), i + md.win_size + 1)
                    for j in range(lo, hi):
                        if j == i:
                            continue
                        src_buf.append(center)
                        dst_buf.append(walk[j])
                        if len(src_buf) == self.batch_size:
                            negs = rng.randint(
                                0, md.num_nodes,
                                (self.batch_size, md.neg_num),
                            )
                            yield {
                                "src": np.asarray(src_buf, np.int64),
                                "dsts": np.concatenate(
                                    [
                                        np.asarray(dst_buf, np.int64)[:, None],
                                        negs,
                                    ],
                                    axis=1,
                                ),
                            }
                            src_buf, dst_buf = [], []
