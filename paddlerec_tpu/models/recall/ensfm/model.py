"""ENSFM: Efficient Non-Sampling Factorization Machines.

Parity target: reference models/recall/ensfm/net.py:24-98 and the
whole-data loss of dygraph_model.py:40-52 — instead of negative sampling,
the squared loss over ALL (user, item) pairs is computed in closed form:

    L = w · Σ_d Σ_d' (Σ_u p_u p_uᵀ) ⊙ (Σ_i q_i q_iᵀ) ⊙ (h hᵀ)
        + Σ_pos ((1−w)·r̂² − 2·r̂)

where p/q are user/item FM representations augmented with their cross
terms and bias columns (net.py:63-98).  The heavy term is two tiny
(E+2)×(E+2) gram matrices — pure MXU work, no sampling.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import ModelDef


class ENSFMNet(nn.Module):
    user_field_m: int
    item_field_m: int
    embedding_size: int

    def _tables(self):
        trunc = nn.initializers.truncated_normal(0.01)
        return (
            nn.Embed(self.user_field_m, self.embedding_size,
                     embedding_init=trunc, name="user_feature_emb"),
            nn.Embed(self.item_field_m + 1, self.embedding_size,
                     embedding_init=trunc, name="all_item_feature_emb"),
            nn.Embed(self.user_field_m, 1, embedding_init=trunc,
                     name="user_bias"),
            nn.Embed(self.item_field_m, 1, embedding_init=trunc,
                     name="item_bias"),
        )

    @nn.compact
    def __call__(self, input_u, item_attribute, input_ur=None,
                 item_bind_m=None):
        """input_u (B, Fu) user feature ids; item_attribute (I, Fi) the
        FULL item catalog's features; input_ur (B, P) positive item
        indices padded with item_bind_m."""
        user_t, item_t, ub_t, ib_t = self._tables()
        h_i = self.param("H_i", nn.initializers.constant(0.01),
                         (self.embedding_size, 1))
        h_s = self.param("H_s", nn.initializers.constant(0.01),
                         (self.embedding_size, 1))
        bias = self.param("bias", nn.initializers.zeros, (1,))

        ue = user_t(input_u)  # (B, Fu, E)
        sum_u = ue.sum(1)
        ie = item_t(item_attribute)  # (I, Fi, E)
        sum_i = ie.sum(1)
        user_cross = 0.5 * (sum_u**2 - (ue**2).sum(1))
        item_cross = 0.5 * (sum_i**2 - (ie**2).sum(1))
        u_score = user_cross @ h_s + ub_t(input_u).sum(1) + bias
        i_score = item_cross @ h_s + ib_t(
            jnp.minimum(item_attribute, self.item_field_m - 1)
        ).sum(1)

        ones_u = jnp.ones((sum_u.shape[0], 1), sum_u.dtype)
        ones_i = jnp.ones((sum_i.shape[0], 1), sum_i.dtype)
        p_emb = jnp.concatenate([sum_u, u_score, ones_u], 1)  # (B, E+2)
        q_emb = jnp.concatenate([sum_i, ones_i, i_score], 1)  # (I, E+2)
        h_emb = jnp.concatenate(
            [h_i, jnp.ones((2, 1), h_i.dtype)], 0
        )  # (E+2, 1)

        pre = (p_emb[:, None, :] * q_emb[None]) @ h_emb  # (B, I, 1)
        pre = pre[..., 0]
        if input_ur is None:
            return (pre,)

        # pad token == item_bind_m is out of range: clip then zero via mask
        pos_item = jnp.take(q_emb, input_ur, axis=0, mode="clip")  # (B,P,E+2)
        pos_valid = (input_ur != item_bind_m).astype(q_emb.dtype)
        pos_item = pos_item * pos_valid[..., None]
        pos_r = ((p_emb[:, None, :] * pos_item) @ h_emb)[..., 0]  # (B, P)
        return pre, pos_r, q_emb, p_emb, h_emb


@register_model("recall.ensfm")
class ModelDef(ModelDef):
    metrics = "none"
    metric_names = ()

    def __init__(self, config: Config):
        super().__init__(config)
        self.num_users = int(config.hyper("num_users", 6069))
        self.num_items = int(config.hyper("num_items", 3953))
        self.mf_dim = int(config.hyper("mf_dim", 8))
        self.negative_weight = float(config.hyper("negative_weight", 0.5))
        self.max_pos = int(config.hyper("max_positives", 64))
        self.module = ENSFMNet(self.num_users, self.num_items, self.mf_dim)

    def _base_optimizer(self):
        import optax

        lr = float(self.config.hyper("optimizer.learning_rate", 0.05))
        return optax.adagrad(lr, initial_accumulator_value=1e-8)

    def model_inputs(self, batch):
        return (
            batch["user_features"], batch["item_attribute"],
            batch["positives"], self.num_items,
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        items = np.arange(self.num_items, dtype=np.int64)[:, None]
        positives = rng.randint(
            0, self.num_items, (batch_size, self.max_pos)
        ).astype(np.int64)
        positives[:, self.max_pos // 2:] = self.num_items  # pad token
        return {
            "user_features": rng.randint(
                0, self.num_users, (batch_size, 1)
            ).astype(np.int64),
            "item_attribute": items,
            "positives": positives,
        }

    def train_forward(self, params, batch):
        pre, pos_r, q_emb, p_emb, h_emb = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        w = self.negative_weight
        # closed-form all-pair term: (Σ q qᵀ) ⊙ (Σ p pᵀ) ⊙ (h hᵀ)
        gram_q = q_emb.T @ q_emb  # (E+2, E+2)
        gram_p = p_emb.T @ p_emb
        loss_all = w * jnp.sum(gram_q * gram_p * (h_emb @ h_emb.T))
        loss_pos = jnp.sum((1.0 - w) * jnp.square(pos_r) - 2.0 * pos_r)
        loss = loss_all + loss_pos
        return loss, {"scores": pre}

    def infer_forward(self, params, batch):
        (pre,) = self.module.apply(
            {"params": params},
            batch["user_features"], batch["item_attribute"],
        )
        return {"scores": pre}

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        from paddlerec_tpu.data.slot_reader import list_data_files

        return ENSFMDataset(
            list_data_files(data_dir), self.num_users, self.num_items,
            self.max_pos, batch_size,
        )


class ENSFMDataset:
    """Interaction CSV in the reference's movielens binding format
    (models/recall/ensfm/data/sample_data/train.csv): each line is one
    positive interaction ``ufeat1-ufeat2-...,ifeat1-ifeat2-...``.
    Distinct user / item feature tuples are bound to dense ids in
    first-seen order (the LoadData.bind_user / bind_item analog,
    movielens_reader.py:46-115); a batch row is one user with its
    positive-item list padded to ``max_pos`` with the ``num_items``
    pad token."""

    def __init__(self, files, num_users, num_items, max_pos, batch_size):
        self.files = list(files)
        self.num_users = num_users
        self.num_items = num_items
        self.max_pos = max_pos
        self.batch_size = batch_size

    def __iter__(self):
        users, items, pos = {}, {}, {}
        for path in self.files:
            with open(path) as f:
                for line in f:
                    parts = line.strip().split(",")
                    if len(parts) < 2:
                        continue
                    uid = users.setdefault(parts[0], len(users))
                    iid = items.setdefault(parts[1], len(items))
                    pos.setdefault(uid % self.num_users, []).append(
                        iid % self.num_items
                    )
        item_attr = np.arange(self.num_items, dtype=np.int64)[:, None]
        uids = sorted(pos)
        bs, mp = self.batch_size, self.max_pos
        for i in range(0, len(uids), bs):
            chunk = uids[i : i + bs]
            positives = np.full((len(chunk), mp), self.num_items, np.int64)
            for r, u in enumerate(chunk):
                p = pos[u][:mp]
                positives[r, : len(p)] = p
            yield {
                "user_features": np.asarray(chunk, np.int64)[:, None],
                "item_attribute": item_attr,
                "positives": positives,
            }
