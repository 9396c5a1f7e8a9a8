"""SIGN (L0-SIGN): detecting beneficial feature interactions with an
L0-regularized graph neural network.

Parity target: reference models/rank/sign/net.py:23-217 — each instance is
a complete directed graph over its F feature nodes:

  * **LinkPred** (net.py:164-217): per edge (i,j), a hard-concrete gate
    s_ij from an edge-embedding MLP — at train time sampled with uniform
    noise through a stretched sigmoid, at eval the deterministic sigmoid;
    the L0 penalty is the gate's open probability.
  * **SIGN message passing** (net.py:116-161): message m_ij =
    W₂ relu(W₁ (x_i ⊙ x_j)) · s_ij, mean-aggregated over open edges;
    graph embedding = node mean → linear → 2 outputs clipped to [0,1].
  * Loss = MSE(one-hot label) + w_l0 · L0 + w_l2 · ‖nodes‖² (dygraph
    model.py:76-86); metrics AUC + ACC on output[:, 1].

TPU-first: the reference builds pgl.Graph objects per batch; here the
complete graph is dense — messages are one (B, F, F, D) elementwise
product + MLP, aggregation a masked mean over axis 2.  No segment ops,
no dynamic edge sets: the gate zeros closed edges instead.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.data.slot_reader import list_data_files, shard_files
from paddlerec_tpu.models.base import Aux, ModelDef


class SIGNNet(nn.Module):
    n_feature: int
    dim: int = 8
    hidden: int = 32
    temp: float = 0.66
    inter_min: float = -0.1
    inter_max: float = 1.1
    pred_edges: bool = True

    @nn.compact
    def __call__(self, node_ids, node_mask, noise=None):
        """node_ids (B, F) feature ids; node_mask (B, F) 1=present;
        noise: optional uniform(0,1) sample of shape (B, F, F) for the
        hard-concrete gates (None → deterministic eval path)."""
        b, f = node_ids.shape
        x = nn.Embed(self.n_feature, self.dim, name="feature_emb")(node_ids)

        # pair products for messages and for the link predictor
        pair = x[:, :, None, :] * x[:, None, :, :]  # (B, F, F, D)
        edge_mask = (
            node_mask[:, :, None] * node_mask[:, None, :]
            * (1.0 - jnp.eye(f)[None])
        )  # (B, F, F) — no self loops

        if self.pred_edges:
            xe = nn.Embed(
                self.n_feature, self.dim,
                embedding_init=nn.initializers.normal(0.01),
                name="feature_emb_edge",
            )(node_ids)
            pe = xe[:, :, None, :] * xe[:, None, :, :]
            hrelu = nn.relu(nn.Dense(self.hidden, name="lp_fc1")(pe))
            loc = nn.Dense(
                1, name="lp_fc2", bias_init=nn.initializers.constant(0.2)
            )(hrelu)[..., 0]  # (B, F, F)
            if noise is not None:
                # stretched hard-concrete sample (net.py:200-207; log2 as in
                # the reference)
                u = jnp.clip(noise, 1e-6, 1 - 1e-6)
                s = nn.sigmoid((loc + jnp.log2(u) - jnp.log2(1 - u)) / self.temp)
            else:
                s = nn.sigmoid(loc)
            s = s * (self.inter_max - self.inter_min) + self.inter_min
            s = jnp.clip(s, 0.0, 1.0)
            l0 = nn.sigmoid(
                loc - self.temp * math.log2(-self.inter_min / self.inter_max)
            )
            l0_penalty = (l0 * edge_mask).sum() / jnp.maximum(edge_mask.sum(), 1.0)
        else:
            s = jnp.ones((b, f, f), x.dtype)
            l0_penalty = jnp.zeros((), x.dtype)

        msg = nn.Dense(self.dim, name="sign_fc2")(
            nn.relu(nn.Dense(self.hidden, name="sign_fc1")(pair))
        ) * s[..., None]
        open_edges = edge_mask * (s > 0)
        nodes = (msg * open_edges[..., None]).sum(2) / jnp.maximum(
            open_edges.sum(2, keepdims=True), 1.0
        )  # (B, F, D)
        l2_penalty = (jnp.square(nodes) * node_mask[..., None]).sum()

        graph_emb = (nodes * node_mask[..., None]).sum(1) / jnp.maximum(
            node_mask.sum(1, keepdims=True), 1.0
        )
        out = jnp.clip(nn.Dense(2, name="g")(graph_emb), 0.0, 1.0)
        return out, l0_penalty, l2_penalty


@register_model("rank.sign")
class ModelDef(ModelDef):
    metric_names = ("auc",)
    stochastic = True  # L0 gates sample uniform noise per train step

    def __init__(self, config: Config):
        super().__init__(config)
        h = config.hyper
        self.n_feature = int(h("n_feature", 1000))
        self.num_nodes = int(h("num_nodes", 3))
        l0 = h("l0_para", [0.66, -0.1, 1.1])
        self.l0_weight = float(h("l0_weight", 0.001))
        self.l2_weight = float(h("l2_weight", 0.001))
        self.module = SIGNNet(
            self.n_feature,
            int(h("dim", 8)),
            int(h("hidden_layer", 32)),
            float(l0[0]), float(l0[1]), float(l0[2]),
            bool(int(h("pred_edges", 1))),
        )

    def model_inputs(self, batch):
        return (batch["nodes"], batch["node_mask"])

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        f = self.num_nodes
        return {
            "nodes": rng.randint(0, self.n_feature, (batch_size, f)
                                 ).astype(np.int64),
            "node_mask": np.ones((batch_size, f), np.float32),
            "label": (rng.rand(batch_size) < 0.5).astype(np.float32),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch, rng=None):
        nodes, node_mask = self.model_inputs(batch)
        noise = (
            jax.random.uniform(rng, nodes.shape[:1] + nodes.shape[1:2] * 2)
            if rng is not None
            else None
        )
        out, l0, l2 = self.module.apply(
            {"params": params}, nodes, node_mask, noise
        )
        labels = batch["label"].reshape(-1).astype(jnp.float32)
        onehot = jnp.stack([1 - labels, labels], -1)
        mask = batch.get("mask")
        w = mask if mask is not None else jnp.ones_like(labels)
        base = (jnp.square(out - onehot).mean(-1) * w).sum() / jnp.maximum(
            w.sum(), 1.0
        )
        loss = base + self.l0_weight * l0 + self.l2_weight * l2
        aux: Aux = {"predictions": out[:, 1], "labels": labels}
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return SIGNDataset(files, self.num_nodes, batch_size)


class SIGNDataset:
    """Lines: ``label feat1 feat2 ... featF`` (frappe-style instance
    graphs, reference models/rank/sign/reader.py)."""

    def __init__(self, files, num_nodes, batch_size):
        self.files = files
        self.num_nodes = num_nodes
        self.batch_size = batch_size

    def __iter__(self):
        bs, f = self.batch_size, self.num_nodes
        nodes = np.zeros((bs, f), np.int64)
        nmask = np.zeros((bs, f), np.float32)
        label = np.zeros((bs,), np.float32)
        i = 0
        for path in self.files:
            with open(path) as fh:
                for line in fh:
                    toks = line.split()
                    if len(toks) < 2:
                        continue
                    label[i] = float(toks[0])
                    feats = [int(v) for v in toks[1 : 1 + f]]
                    nodes[i, : len(feats)] = feats
                    nmask[i, : len(feats)] = 1.0
                    i += 1
                    if i == bs:
                        yield {
                            "nodes": nodes.copy(), "node_mask": nmask.copy(),
                            "label": label.copy(),
                            "mask": np.ones(bs, np.float32),
                        }
                        nodes[:] = 0
                        nmask[:] = 0
                        i = 0
        if i:
            m = np.zeros(bs, np.float32)
            m[:i] = 1.0
            yield {
                "nodes": nodes.copy(), "node_mask": nmask.copy(),
                "label": label.copy(), "mask": m,
            }
