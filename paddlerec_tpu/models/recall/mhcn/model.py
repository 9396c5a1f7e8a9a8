"""MHCN: multi-channel hypergraph convolutional network for social
recommendation (self-supervised).

Parity target: reference models/recall/mhcn/net.py:24-375 —
  * motif-induced adjacency matrices H_s (social triangles), H_j (joint
    purchase), H_p (repeat-purchase) built host-side from the social and
    rating matrices (net.py:168-205, reproduced in
    ``build_motif_adjacency``);
  * three self-gated user channels propagated through their motif
    matrices for n layers, a fourth "simple" channel through the
    normalized rating matrix; channel attention mixes them
    (net.py:255-318);
  * BPR loss on (user, pos, neg) triples + hierarchical self-supervision:
    local and global mutual-information maximization per channel with
    row/row-column shuffled negatives (net.py:340-374), ss_rate 0.01.

TPU-first: the adjacency matrices are dense (B×B matmuls on the MXU —
the reference densifies them too, net.py:205); shuffles come from the
trainer-supplied per-step rng (stochastic=True).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import ModelDef


def build_motif_adjacency(social: np.ndarray, rating: np.ndarray):
    """Dense replica of buildMotifInducedAdjacencyMatrix (net.py:168-205).

    social: (U, U) 0/1 directed follow matrix; rating: (U, I) 0/1.
    Returns (H_s, H_j, H_p, R_norm) float32.
    """
    s = social.astype(np.float64)
    y = rating.astype(np.float64)
    b = s * s.T
    u = s - b
    c1 = (u @ u) * u.T
    a1 = c1 + c1.T
    c2 = (b @ u) * u.T + (u @ b) * u.T + (u @ u) * b
    a2 = c2 + c2.T
    c3 = (b @ b) * u + (b @ u) * b + (u @ b) * b
    a3 = c3 + c3.T
    a4 = (b @ b) * b
    c5 = (u @ u) * u + (u @ u.T) * u + (u.T @ u) * u
    a5 = c5 + c5.T
    a6 = (u @ b) * u + (b @ u.T) * u.T + (u.T @ u) * b
    a7 = (u.T @ b) * u.T + (b @ u) * u + (u @ u.T) * b
    a8 = (y @ y.T) * b
    a9 = (y @ y.T) * u
    a9 = a9 + a9.T
    a10 = y @ y.T - a8 - a9

    def rownorm(m):
        denom = m.sum(axis=1, keepdims=True)
        return np.divide(m, denom, out=np.zeros_like(m), where=denom > 0)

    h_s = rownorm(a1 + a2 + a3 + a4 + a5 + a6 + a7)
    h_j = rownorm(a8 + a9)
    h_p = rownorm(a10 * (a10 > 1))

    deg_u = np.maximum(y.sum(1, keepdims=True), 1.0)
    deg_i = np.maximum(y.sum(0, keepdims=True), 1.0)
    r_norm = y / np.sqrt(deg_u) / np.sqrt(deg_i)
    return (
        h_s.astype(np.float32), h_j.astype(np.float32),
        h_p.astype(np.float32), r_norm.astype(np.float32),
    )


class MHCNNet(nn.Module):
    num_users: int
    num_items: int
    emb_size: int = 50
    n_layers: int = 2

    def _gate(self, x, name):
        w = self.param(f"{name}_w", nn.initializers.xavier_uniform(),
                       (self.emb_size, self.emb_size))
        b = self.param(f"{name}_b", nn.initializers.xavier_uniform(),
                       (1, self.emb_size))
        return x * nn.sigmoid(x @ w + b)

    def _channel_attention(self, att_m, att_v, *channels):
        scores = jnp.stack(
            [jnp.sum(att_v * (c @ att_m), -1) for c in channels], 0
        )  # (C, U)
        w = jax.nn.softmax(scores, 0)
        mixed = sum(w[i][:, None] * c for i, c in enumerate(channels))
        return mixed, w

    @nn.compact
    def __call__(self, h_s, h_j, h_p, r_norm):
        trunc = nn.initializers.truncated_normal(0.005)
        user_w = self.param("user_embeddings", trunc,
                            (self.num_users, self.emb_size))
        item_w = self.param("item_embeddings", trunc,
                            (self.num_items, self.emb_size))
        att_m = self.param("attention_mat", nn.initializers.xavier_uniform(),
                           (self.emb_size, self.emb_size))
        att_v = self.param("attention", nn.initializers.xavier_uniform(),
                           (1, self.emb_size))

        def norm(x):
            # eps inside the rsqrt: linalg.norm has a NaN gradient at the
            # all-zero rows that empty motif matrices produce
            return x * jax.lax.rsqrt(
                jnp.sum(x * x, axis=1, keepdims=True) + 1e-12
            )

        c1 = self._gate(user_w, "gating1")
        c2 = self._gate(user_w, "gating2")
        c3 = self._gate(user_w, "gating3")
        simple = self._gate(user_w, "gating4")
        acc1, acc2, acc3, acc_s = c1, c2, c3, simple
        item = item_w
        acc_i = item
        for _ in range(self.n_layers):
            mixed = self._channel_attention(att_m, att_v, c1, c2, c3)[0] + simple / 2.0
            c1 = h_s @ c1
            acc1 = acc1 + norm(c1)
            c2 = h_j @ c2
            acc2 = acc2 + norm(c2)
            c3 = h_p @ c3
            acc3 = acc3 + norm(c3)
            new_item = r_norm.T @ mixed
            acc_i = acc_i + norm(new_item)
            simple = r_norm @ item
            acc_s = acc_s + norm(simple)
            item = new_item
        final_user, _ = self._channel_attention(att_m, att_v, acc1, acc2, acc3)
        final_user = final_user + acc_s / 2.0
        # self-supervised gated views of the final user embedding
        # (self_supervised_gating, net.py:217-222)
        ss_views = tuple(
            self._gate(final_user, f"sgating{i}") for i in (1, 2, 3)
        )
        return final_user, acc_i, ss_views


@register_model("recall.mhcn")
class ModelDef(ModelDef):
    metrics = "none"
    metric_names = ()
    stochastic = True  # self-supervision shuffles need a per-step rng

    def __init__(self, config: Config):
        super().__init__(config)
        self.num_users = int(config.hyper("num_users", 64))
        self.num_items = int(config.hyper("num_items", 64))
        self.emb_size = int(config.hyper("num_factors", 50))
        self.ss_rate = float(config.hyper("ss_rate", 0.01))
        self.module = MHCNNet(
            self.num_users, self.num_items, self.emb_size,
            int(config.hyper("n_layer", 2)),
        )
        self._adj = None  # (H_s, H_j, H_p, R) set by set_graph / example data

    def set_graph(self, social: np.ndarray, rating: np.ndarray):
        self._adj = tuple(
            jnp.asarray(m) for m in build_motif_adjacency(social, rating)
        )

    def _graph(self):
        if self._adj is None:
            if not bool(self.config.hyper("demo_graph", False)):
                raise RuntimeError(
                    "MHCN needs the social/rating adjacency: call "
                    "set_graph(social, rating) before training, or set "
                    "hyper_parameters.demo_graph: true to train on a "
                    "random synthetic graph (tests/demos only)"
                )
            # explicit demo mode: synthetic 10%-density graph
            rng = np.random.RandomState(0)
            social = (rng.rand(self.num_users, self.num_users) < 0.1).astype(
                np.float32
            )
            np.fill_diagonal(social, 0)
            rating = (rng.rand(self.num_users, self.num_items) < 0.1).astype(
                np.float32
            )
            self.set_graph(social, rating)
        return self._adj

    def model_inputs(self, batch):
        return self._graph()

    def init_with_batch(self, rng, batch):
        return self.module.init(rng, *self._graph())["params"]

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        return {
            "users": rng.randint(0, self.num_users, batch_size).astype(np.int64),
            "pos_items": rng.randint(0, self.num_items, batch_size
                                     ).astype(np.int64),
            "neg_items": rng.randint(0, self.num_items, batch_size
                                     ).astype(np.int64),
        }

    def _hierarchical_ss(self, user_emb, adj, rng):
        """Local + global mutual-information loss (net.py:340-374)."""
        k1, k2, k3 = jax.random.split(rng, 3)
        edge = adj @ user_emb

        def score(a, b):
            return jnp.sum(a * b, 1)

        row_shuf = user_emb[jax.random.permutation(k1, user_emb.shape[0])]
        rc = edge.T[jax.random.permutation(k2, edge.shape[1])].T
        rc = rc[jax.random.permutation(k3, rc.shape[0])]
        pos = score(user_emb, edge)
        neg1 = score(row_shuf, edge)
        local = jnp.sum(
            -jax.nn.log_sigmoid(pos - neg1) - jax.nn.log_sigmoid(neg1 - score(rc, user_emb))
        )
        graph = edge.mean(0)
        global_ = jnp.sum(
            -jax.nn.log_sigmoid(score(edge, graph) - score(rc, graph))
        )
        return local + global_

    def train_forward(self, params, batch, rng=None):
        h_s, h_j, h_p, r = self._graph()
        user_emb, item_emb, ss_views = self.module.apply(
            {"params": params}, h_s, h_j, h_p, r
        )
        u = user_emb[batch["users"]]
        pos = item_emb[batch["pos_items"]]
        neg = item_emb[batch["neg_items"]]
        score = jnp.sum(u * (pos - neg), 1)
        rec_loss = -jnp.sum(jnp.log(nn.sigmoid(score) + 1e-7))

        ss_loss = jnp.zeros(())
        if rng is not None:
            for i, (gated, adj) in enumerate(
                zip(ss_views, (h_s, h_j, h_p))
            ):
                ss_loss = ss_loss + self._hierarchical_ss(
                    gated, adj, jax.random.fold_in(rng, i)
                )
        loss = rec_loss + self.ss_rate * ss_loss
        return loss, {"rec_loss": rec_loss, "ss_loss": ss_loss}

    def user_item_embeddings(self, params):
        h_s, h_j, h_p, r = self._graph()
        user_emb, item_emb, _ = self.module.apply(
            {"params": params}, h_s, h_j, h_p, r
        )
        return np.asarray(user_emb), np.asarray(item_emb)
