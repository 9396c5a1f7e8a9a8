"""Graph-learning model: metapath-walk skip-gram with an optional GNN
encoder (the PGLBox model family).

Parity target: reference models/graph/models/gnn_model.py:143-230 +
models/graph/{lightgcn,transformer_conv,deepwalk_million}.yaml —
  * (src, pos) pairs from metapath random walks with window win_size
    (yaml walk config; walker reproduced host-side in GraphWalkDataset);
  * node features = id embedding (optionally summed slot embeddings);
  * ``sage_mode``: a stack of GNN conv layers over fixed-fanout sampled
    neighborhoods (sage_layer_type yaml key; lightgcn.yaml uses
    "lightgcn", transformer_conv.yaml "transformer_conv",
    deepwalk_million has sage_mode: False → pure skip-gram);
  * logits = src · [pos ‖ shuffled in-batch negatives] with nce / hinge /
    sigmoid losses (loss.py:37-111), neg_num negatives.

TPU-first: neighbor fan-out is static (config ``samples``), negatives
are batch rolls (jnp.roll — deterministic analog of shuffle_batch that
never collides with the positive), the whole step is one jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.data.slot_reader import list_data_files, shard_files
from paddlerec_tpu.models.base import ModelDef
from paddlerec_tpu.models.graph.layers import CONV_REGISTRY


class GNNEncoder(nn.Module):
    num_nodes: int
    emb_size: int
    conv_type: str = "lightgcn"
    num_layers: int = 1

    @nn.compact
    def __call__(self, nodes, neighbors=None, neighbor_mask=None):
        """nodes (...,); neighbors (..., L hops of K) as a list of arrays
        [(..., K), (..., K, K), ...]; encode with num_layers convs."""
        emb = nn.Embed(self.num_nodes, self.emb_size, name="node_embedding")
        if neighbors is None or self.num_layers == 0:
            return emb(nodes)
        conv_cls = CONV_REGISTRY[self.conv_type]
        # features at every hop
        feats = [emb(nodes)] + [emb(nb) for nb in neighbors]
        masks = list(neighbor_mask)
        # aggregate from the deepest hop inwards; masks[d] always belongs
        # to hop d+1's fan-out, regardless of layer
        for layer in range(self.num_layers):
            conv = conv_cls(self.emb_size, name=f"conv_{layer}")
            feats = [
                conv(feats[d], feats[d + 1], masks[d])
                for d in range(len(feats) - 1)
            ]
        return feats[0]


@register_model("graph.gnn")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        h = config.hyper
        self.num_nodes = int(h("num_nodes", 10000))
        self.emb_size = int(h("emb_size", 64))
        self.neg_num = int(h("neg_num", 5))
        self.win_size = int(h("win_size", 2))
        self.walk_len = int(h("walk_len", 4))
        self.walk_times = int(h("walk_times", 10))
        self.sage_mode = bool(h("sage_mode", True))
        self.samples = [
            int(x) for x in str(h("samples", "5")).split(",")
        ] if self.sage_mode else []
        self.loss_type = str(h("loss_type", "nce"))
        self.margin = float(h("margin", 2.0))
        self.nce_tao = float(h("nce_tao", 5.0))
        self.module = GNNEncoder(
            self.num_nodes, self.emb_size,
            str(h("sage_layer_type", "lightgcn")).lower(),
            len(self.samples),
        )

    def model_inputs(self, batch):
        if not self.sage_mode:
            return (batch["pair_nodes"], None, None)
        hops = len(self.samples)
        return (
            batch["pair_nodes"],
            [batch[f"neigh_{i}"] for i in range(hops)],
            [batch[f"neigh_mask_{i}"] for i in range(hops)],
        )

    def init_with_batch(self, rng, batch):
        return self.module.init(rng, *self.model_inputs(batch))["params"]

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        out = {
            "pair_nodes": rng.randint(
                0, self.num_nodes, (batch_size, 2)
            ).astype(np.int64)
        }
        shape = (batch_size, 2)
        for i, k in enumerate(self.samples):
            shape = shape + (k,)
            out[f"neigh_{i}"] = rng.randint(0, self.num_nodes, shape
                                            ).astype(np.int64)
            out[f"neigh_mask_{i}"] = (rng.rand(*shape) < 0.8).astype(
                np.float32
            )
        return out

    def train_forward(self, params, batch):
        feature = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )  # (B, 2, E)
        src = feature[:, 0]
        pos = feature[:, 1]
        # in-batch negatives: rolled positives (shuffle_batch analog,
        # gnn_model.py:186-189).  Consecutive walk windows repeat dst
        # nodes, so a rolled row can equal the TRUE positive — mask
        # those slots out of the loss and metrics instead of training
        # the positive away from its neighbor
        pos_ids = batch["pair_nodes"][:, 1]
        negs = [jnp.roll(pos, k + 1, axis=0) for k in range(self.neg_num)]
        neg_ok = jnp.stack(
            [jnp.roll(pos_ids, k + 1, axis=0) != pos_ids
             for k in range(self.neg_num)], axis=1
        ).astype(jnp.float32)  # (B, neg)
        dsts = jnp.stack([pos] + negs, axis=1)  # (B, 1+neg, E)
        logits = jnp.einsum("be,bne->bn", src, dsts)

        if self.loss_type == "hinge":
            loss = jnp.sum(
                nn.relu(logits[:, 1:] - logits[:, :1] + self.margin) * neg_ok
            )
        elif self.loss_type == "sigmoid":
            import optax

            labels = jnp.concatenate(
                [jnp.ones_like(logits[:, :1]), jnp.zeros_like(logits[:, 1:])],
                -1,
            )
            weight = jnp.concatenate(
                [jnp.full_like(logits[:, :1], self.neg_num), neg_ok], -1
            )
            loss = jnp.sum(
                optax.sigmoid_binary_cross_entropy(logits, labels) * weight
            )
        else:  # nce (default, loss.py:50-62)
            # collided negatives contribute exp(-inf) = 0 to the partition
            scaled = logits * self.nce_tao
            scaled = jnp.concatenate(
                [scaled[:, :1],
                 jnp.where(neg_ok > 0, scaled[:, 1:], -1e9)], -1
            )
            loss = jnp.sum(-jax.nn.log_softmax(scaled, -1)[:, 0])

        preds = jax.nn.sigmoid(logits).reshape(-1)
        labels = jnp.concatenate(
            [jnp.ones_like(logits[:, :1]), jnp.zeros_like(logits[:, 1:])], -1
        ).reshape(-1)
        vmask = jnp.concatenate(
            [jnp.ones_like(logits[:, :1]), neg_ok], -1
        ).reshape(-1)
        return loss, {"predictions": preds, "labels": labels,
                      "mask": vmask}

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        seed = int(self.config.runner("seed", 2023))
        engine = str(self.config.runner("graph_engine", "native")).lower()
        if engine != "python":
            # native CSR walker/sampler with memory-capped chunked
            # passes + preload (the PGLBox graph engine analog)
            from paddlerec_tpu.native import NativeUnavailable

            try:
                from paddlerec_tpu.data.graph_dataset import (
                    GraphChunkedDataset,
                )

                return GraphChunkedDataset(
                    files, self, batch_size, seed=seed,
                    num_parts=int(
                        self.config.runner("graph_num_parts", 4)
                    ),
                )
            except NativeUnavailable:
                pass  # toolchain-less: python walker below
        return GraphWalkDataset(files, self, batch_size, seed=seed)


# the reference yaml names are first-class models (models/graph/*.yaml)
@register_model("graph.lightgcn")
class LightGCNModelDef(ModelDef):
    def __init__(self, config: Config):
        config._flat.setdefault("hyper_parameters.sage_layer_type", "lightgcn")
        config._flat.setdefault("hyper_parameters.sage_mode", True)
        super().__init__(config)


@register_model("graph.transformer_conv")
class TransformerConvModelDef(ModelDef):
    def __init__(self, config: Config):
        config._flat.setdefault(
            "hyper_parameters.sage_layer_type", "transformer_conv"
        )
        config._flat.setdefault("hyper_parameters.sage_mode", True)
        super().__init__(config)


@register_model("graph.deepwalk_million")
class DeepwalkMillionModelDef(ModelDef):
    def __init__(self, config: Config):
        config._flat.setdefault("hyper_parameters.sage_mode", False)
        super().__init__(config)


class GraphWalkDataset:
    """Edge files ``src dst [etype]`` → random walks → (src, pos) window
    pairs with fixed-fanout neighbor samples (the PGLBox walk+sample
    pipeline, host-side)."""

    def __init__(self, files, md, batch_size, seed=2023):
        self.files = files
        self.md = md
        self.batch_size = batch_size
        self.seed = seed
        # persistent across epochs: fresh walks each epoch (re-seeding
        # per __iter__ made every epoch byte-identical) and a one-time
        # adjacency parse
        self._rng = np.random.RandomState(seed)
        self._adj_cache = None

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
                    adj.setdefault(b, []).append(a)  # symmetry: True
        return adj

    def _sample_neighbors(self, nodes, adj, rng, fanout):
        flat = nodes.reshape(-1)
        out = np.zeros((len(flat), fanout), np.int64)
        mask = np.zeros((len(flat), fanout), np.float32)
        for i, n in enumerate(flat):
            nbrs = adj.get(int(n))
            if not nbrs:
                continue
            pick = rng.randint(0, len(nbrs), fanout)
            out[i] = [nbrs[p] for p in pick]
            mask[i] = 1.0
        return (
            out.reshape(nodes.shape + (fanout,)),
            mask.reshape(nodes.shape + (fanout,)),
        )

    def __iter__(self):
        md = self.md
        rng = self._rng
        if self._adj_cache is None:
            self._adj_cache = self._adjacency()
        adj = self._adj_cache
        if not adj:
            return
        nodes = list(adj)
        pairs = []
        for _ in range(md.walk_times):
            rng.shuffle(nodes)
            for start in nodes:
                walk = [start]
                for _ in range(md.walk_len - 1):
                    nbrs = adj.get(walk[-1])
                    if not nbrs:
                        break
                    walk.append(nbrs[rng.randint(len(nbrs))])
                for i, center in enumerate(walk):
                    lo, hi = max(0, i - md.win_size), min(
                        len(walk), i + md.win_size + 1
                    )
                    for j in range(lo, hi):
                        if j != i:
                            pairs.append((center, walk[j]))
                            if len(pairs) == self.batch_size:
                                yield self._batch(pairs, adj, rng)
                                pairs = []

    def _batch(self, pairs, adj, rng):
        md = self.md
        out = {"pair_nodes": np.asarray(pairs, np.int64)}
        prev = out["pair_nodes"]
        for i, fanout in enumerate(md.samples):
            nb, mask = self._sample_neighbors(prev, adj, rng, fanout)
            out[f"neigh_{i}"] = nb
            out[f"neigh_mask_{i}"] = mask
            prev = nb
        return out
