"""IPRec: package recommendation (item + business + friends bundles).

Parity target: reference models/rank/iprec/net.py:25-347 —
  * **dual aggregate** (net.py:321-347): user representation from three
    attention pools (interacted friends / items / bizs) mixed by a type
    attention, fused with the id embedding through W_self;
  * **intra-package** (net.py:268-319): for each package (target, the
    user's u_max_pack historical packages, and the target's biz-/friend-
    side neighbor packages) K social-influence attention heads pool the
    package's friends against its item; a user-conditioned attention
    mixes the K heads; the final package vector attends over the 7
    multiplicative combinations of (friends, item, biz);
  * **gate attention** (net.py:25-45): sigmoid gates aggregate neighbor
    packages into the target package and historical packages into the
    user;
  * head: MLP[3D → 64 → 32 → 1] on [user, pack, user⊙pack] → sigmoid.

Note: the reference's Attention.forward inverts its mask (net.py:72-73
pads where mask==True) — reproduced here the *correct* way (pad where
mask==0), which is the published model's intent.

TPU-first: every package of every kind is processed in one batched call
over a (B·N_pk) leading axis; the 7 combinations are a stacked tensor,
not a Python list of graph ops.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import Aux, ModelDef, binary_logloss

NEG = -(2.0**31)


class UserAttention(nn.Module):
    """Attention(2D→D) of net.py:48-76: score from [query ‖ key] MLP."""

    hidden: int

    @nn.compact
    def __call__(self, query, keys, mask):
        # query (B, D) → tiled; keys (B, N, D); mask (B, N)
        q = jnp.broadcast_to(query[:, None, :], keys.shape)
        x = nn.Dense(self.hidden, use_bias=False, name="w")(
            jnp.concatenate([q, keys], -1)
        )
        x = nn.relu(nn.LayerNorm(name="norm")(x))
        u = self.param("u_omega", nn.initializers.normal(0.1), (1,))
        v = jnp.tanh(nn.Dense(1, name="w_omega")(x))[..., 0] * u[0]
        att = jax.nn.softmax(jnp.where(mask > 0, v, NEG), -1)
        return jnp.einsum("bn,bnd->bd", att, keys), att


class GateAttention(nn.Module):
    """Sigmoid gate aggregation (net.py:25-45)."""

    hidden: int

    @nn.compact
    def __call__(self, anchor, others, mask):
        # anchor (B, D); others (B, N, D); mask (B, N)
        x1 = nn.Dense(self.hidden, use_bias=False, name="w1")(anchor)
        x2 = nn.Dense(self.hidden, name="w2")(others)
        attn = nn.sigmoid(x1[:, None, :] + x2) * mask[..., None]
        return (attn * others).sum(1)


class IPRecNet(nn.Module):
    num_users: int
    num_items: int
    num_bizs: int
    hidden: int = 64
    f_max_len: int = 20
    K: int = 4

    @nn.compact
    def __call__(
        self, user, item, biz, friends, user_items, user_bizs, user_friends,
        user_packages, pack_neighbors_b, pack_neighbors_f,
    ):
        D = self.hidden
        user_emb_t = nn.Embed(self.num_users + 1, D, name="user_emb")
        item_emb_t = nn.Embed(self.num_items + 1, D, name="item_emb")
        biz_emb_t = nn.Embed(self.num_bizs + 1, D, name="biz_emb")
        b = user.shape[0]

        def nonzero_mask(ids):
            return (ids != 0).astype(jnp.float32)

        # ---- dual aggregate (user modeling) ----
        u0 = user_emb_t(user)
        f_vec, _ = UserAttention(D, name="friend_attn")(
            u0, user_emb_t(user_friends), nonzero_mask(user_friends)
        )
        i_vec, _ = UserAttention(D, name="item_attn")(
            u0, item_emb_t(user_items), nonzero_mask(user_items)
        )
        b_vec, _ = UserAttention(D, name="biz_attn")(
            u0, biz_emb_t(user_bizs), nonzero_mask(user_bizs)
        )
        types = jnp.stack([f_vec, i_vec, b_vec], 1)
        t_vec, _ = UserAttention(D, name="type_attn")(
            u0, types, jnp.ones((b, 3))
        )
        u_emb = nn.relu(
            nn.Dense(D, use_bias=False, name="w_self")(
                jnp.concatenate([t_vec, u0], -1)
            )
        )

        # ---- package tensor: target + historical + neighbors ----
        target_pack = jnp.concatenate(
            [item[:, None, None], biz[:, None, None], friends[:, None, :]], -1
        )  # (B, 1, 2+F)
        packs = jnp.concatenate(
            [target_pack, user_packages, pack_neighbors_b, pack_neighbors_f],
            axis=1,
        )  # (B, N_pk, 2+F)
        n_pk = packs.shape[1]
        p_item = item_emb_t(packs[..., 0])  # (B, N, D)
        p_biz = biz_emb_t(packs[..., 1])
        p_friends = user_emb_t(packs[..., 2:])  # (B, N, F, D)
        f_mask = nonzero_mask(packs[..., 2:])  # (B, N, F)

        # K social-influence heads (IntraLayer, net.py:79-112)
        heads = []
        for k in range(self.K):
            fk = nn.Dense(D, use_bias=False, name=f"intra_{k}_wk")(p_friends)
            it = nn.Dense(D, use_bias=False, name=f"intra_{k}_wi")(p_item)
            score_in = jnp.concatenate(
                [jnp.broadcast_to(it[:, :, None, :], fk.shape), fk], -1
            )
            uo = self.param(
                f"intra_{k}_u", nn.initializers.normal(0.1), (1,)
            )
            v = jnp.tanh(
                nn.Dense(1, name=f"intra_{k}_w")(score_in)
            )[..., 0] * uo[0]
            att = jax.nn.softmax(jnp.where(f_mask > 0, v, NEG), -1)
            heads.append(jnp.einsum("bnf,bnfd->bnd", att, fk))
        f_K = jnp.stack(heads, 2)  # (B, N, K, D)

        # user-conditioned mix of the K heads (net.py:288-306)
        uq = jnp.broadcast_to(u_emb[:, None, None, :], f_K.shape)
        mix_in = nn.relu(
            nn.Dense(D, use_bias=False, name="w_a")(
                jnp.concatenate([uq, f_K], -1)
            )
        )
        uo = self.param("u_omega", nn.initializers.normal(0.1), (1,))
        v = jnp.tanh(nn.Dense(1, name="w_omega")(mix_in))[..., 0] * uo[0]
        att = jax.nn.softmax(v, -1)  # (B, N, K)
        f_emb = jnp.einsum("bnk,bnkd->bnd", att, f_K)

        # 7-way interaction attention (net.py:308-317)
        combos = jnp.stack(
            [
                f_emb, p_item, p_biz, f_emb * p_item, f_emb * p_biz,
                p_item * p_biz, f_emb * p_item * p_biz,
            ],
            axis=2,
        )  # (B, N, 7, D)
        flat = combos.reshape(b * n_pk, 7, D)
        uq2 = jnp.broadcast_to(
            u_emb[:, None, :], (b, n_pk, D)
        ).reshape(b * n_pk, D)
        pack_vec, _ = UserAttention(D, name="pack_attn")(
            uq2, flat, jnp.ones((b * n_pk, 7))
        )
        pack_vec = pack_vec.reshape(b, n_pk, D)

        u_max_pack = user_packages.shape[1]
        nb = pack_neighbors_b.shape[1]
        tar = pack_vec[:, 0]
        u_packs = pack_vec[:, 1 : 1 + u_max_pack]
        pb_packs = pack_vec[:, 1 + u_max_pack : 1 + u_max_pack + nb]
        pf_packs = pack_vec[:, 1 + u_max_pack + nb :]

        def pk_mask(p):
            return (jnp.abs(p).sum(-1) != 0).astype(jnp.float32)

        pack_emb = (
            tar
            + GateAttention(D, name="biz_gate")(
                tar, pb_packs, pk_mask(pack_neighbors_b)
            )
            + GateAttention(D, name="friend_gate")(
                tar, pf_packs, pk_mask(pack_neighbors_f)
            )
        )
        u_final = u_emb + GateAttention(D, name="user_gate")(
            u_emb, u_packs, pk_mask(user_packages)
        )

        h = jnp.concatenate([u_final, pack_emb, u_final * pack_emb], -1)
        for i, d in enumerate((64, 32)):
            h = nn.relu(nn.Dense(d, name=f"dnn_{i}")(h))
        return nn.Dense(1, name="dnn_out")(h)[:, 0]


@register_model("rank.iprec")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        h = config.hyper
        self.num_users = int(h("num_users", 554237))
        self.num_items = int(h("num_items", 344087))
        self.num_bizs = int(h("num_bizs", 166465))
        self.f_max_len = int(h("f_max_len", 20))
        self.u_max_i = int(h("u_max_i", 99))
        self.u_max_f = int(h("u_max_f", 220))
        self.u_max_pack = int(h("u_max_pack", 50))
        self.pack_max_nei_b = int(h("pack_max_nei_b", 20))
        self.pack_max_nei_f = int(h("pack_max_nei_f", 20))
        self.module = IPRecNet(
            self.num_users, self.num_items, self.num_bizs,
            int(h("hidden_units", 64)), self.f_max_len, int(h("k", 4)),
        )

    def model_inputs(self, batch):
        return (
            batch["user"], batch["item"], batch["biz"], batch["friends"],
            batch["user_items"], batch["user_bizs"], batch["user_friends"],
            batch["user_packages"], batch["pack_neighbors_b"],
            batch["pack_neighbors_f"],
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)

        def ids(hi, *shape):
            return rng.randint(0, hi, shape).astype(np.int64)

        def packages(n):
            # package layout: [item_id, biz_id, friend ids...] (net.py:208-216)
            return np.concatenate(
                [
                    ids(self.num_items, batch_size, n, 1),
                    ids(self.num_bizs, batch_size, n, 1),
                    ids(self.num_users, batch_size, n, self.f_max_len),
                ],
                axis=-1,
            )

        return {
            "user": ids(self.num_users, batch_size),
            "item": ids(self.num_items, batch_size),
            "biz": ids(self.num_bizs, batch_size),
            "friends": ids(self.num_users, batch_size, self.f_max_len),
            "user_items": ids(self.num_items, batch_size, self.u_max_i),
            "user_bizs": ids(self.num_bizs, batch_size, self.u_max_i),
            "user_friends": ids(self.num_users, batch_size, self.u_max_f),
            "user_packages": packages(self.u_max_pack),
            "pack_neighbors_b": packages(self.pack_max_nei_b),
            "pack_neighbors_f": packages(self.pack_max_nei_f),
            "label": (rng.rand(batch_size) < 0.5).astype(np.float32),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        logits = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        labels = batch["label"].reshape(-1).astype(jnp.float32)
        mask = batch.get("mask")
        loss = binary_logloss(logits, labels, mask)
        aux: Aux = {"predictions": jax.nn.sigmoid(logits), "labels": labels}
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        from paddlerec_tpu.data.slot_reader import list_data_files

        return IPRECDataset(self, list_data_files(data_dir), batch_size)


class IPRECDataset:
    """JSON-lines reader (reference rank/iprec/reader.py:24-70): each line
    is an object whose values, in order, are user, item, biz, friends,
    user_items, user_bizs, user_friends, user_packages, pack_neighbors_b,
    pack_neighbors_f, label1, label2.  Ragged lists are padded/truncated
    to the config maxima; package lists flatten to rows of
    ``[item, biz, friends...]`` (f_max_len + 2 wide)."""

    def __init__(self, md, files, batch_size):
        self.md = md
        self.files = list(files)
        self.batch_size = batch_size

    @staticmethod
    def _pad1(x, length):
        x = list(x)[:length]
        return x + [0] * (length - len(x))

    def _packs(self, flat, length):
        w = self.md.f_max_len + 2
        arr = np.asarray(list(flat) + [0] * (-len(flat) % w),
                         np.int64).reshape(-1, w)[:length]
        out = np.zeros((length, w), np.int64)
        out[: len(arr)] = arr
        return out

    def _row(self, data):
        md = self.md
        (user, item, biz, friends, u_items, u_bizs, u_friends, u_packs,
         nei_b, nei_f, label1, *_rest) = list(data.values())
        return {
            "user": np.int64(user % md.num_users),
            "item": np.int64(item % md.num_items),
            "biz": np.int64(biz % md.num_bizs),
            "friends": np.asarray(self._pad1(friends, md.f_max_len),
                                  np.int64),
            "user_items": np.asarray(self._pad1(u_items, md.u_max_i),
                                     np.int64),
            "user_bizs": np.asarray(self._pad1(u_bizs, md.u_max_i),
                                    np.int64),
            "user_friends": np.asarray(self._pad1(u_friends, md.u_max_f),
                                       np.int64),
            "user_packages": self._packs(u_packs, md.u_max_pack),
            "pack_neighbors_b": self._packs(nei_b, md.pack_max_nei_b),
            "pack_neighbors_f": self._packs(nei_f, md.pack_max_nei_f),
            "label": np.float32(label1),
        }

    def __iter__(self):
        import json

        buf = []
        for path in self.files:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        buf.append(self._row(json.loads(line)))
                    except (ValueError, TypeError):
                        continue
                    if len(buf) == self.batch_size:
                        yield self._batch(buf)
                        buf = []
        if buf:
            yield self._batch(buf)

    @staticmethod
    def _batch(rows):
        out = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
        out["mask"] = np.ones(len(rows), np.float32)
        return out
