"""DMR: Deep Match to Rank (Alimama display-ad CTR).

Parity target: reference models/rank/dmr/net.py:22-554 — two relevance
subnets over a length-50 behavior history:

  * **User-to-Item** (deep_match, net.py:239-303): position+btag context
    query → attention scores → causal (tril) softmax mixes the history at
    every prefix; a projection of the prefix-mixed history at position
    T-1 is the user vector; the auxiliary match loss is a full softmax
    over cate_size predicting the last clicked category from the T-2
    prefix vector.  rel_u2i = ⟨user_vector, dm_item_embedding(cate_id)⟩.
  * **Item-to-Item** (dmr_fcn_attention, net.py:305-357): target-aware
    attention with position context; rel_i2i = Σ unnormalized scores;
    attended history is a feature.
  * Final MLP 512-256-128-1 with PReLU over [user_feat, item_feat,
    context, Σhistory, item⊙Σhistory, rel_u2i, rel_i2i, attended].

Loss = BCE + 0.1 · aux softmax loss (net.py:511, 550).

TPU-first: the (B,T,T) causal softmax is one masked matmul (no Python
loops); the aux full-softmax logits (B, cate_size) run as a single MXU
matmul against the dm item table.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.data.slot_reader import list_data_files, shard_files
from paddlerec_tpu.models.base import Aux, ModelDef, binary_logloss
from paddlerec_tpu.ops.layers import MLP

PROFILE_FIELDS = (
    "cms_segid", "cms_group_id", "final_gender_code", "age_level",
    "pvalue_level", "shopping_level", "occupation", "new_user_class_level",
)


class PReLU(nn.Module):
    """PReLU with a configurable parameter axis.

    The reference's (B, T, C) activations use
    paddle.nn.PReLU(num_parameters=history_length) — PER-POSITION alphas
    along axis 1 (net.py:212-230); 2-D activations are per-channel.
    ``axis`` selects which axis carries the learned alphas."""

    axis: int = -1

    @nn.compact
    def __call__(self, x):
        ax = self.axis % x.ndim
        shape = tuple(x.shape[i] if i == ax else 1 for i in range(x.ndim))
        alpha = self.param(
            "alpha", nn.initializers.constant(0.1), shape
        )
        return jnp.where(x >= 0, x, alpha * x)


class DMRNet(nn.Module):
    vocab: dict  # name → size
    main_e: int = 32
    other_e: int = 8
    history_length: int = 50

    @nn.compact
    def __call__(
        self, hist_btag, hist_cate, hist_brand, mask, match_mask,
        profile, uid, mid, cate_id, campaign, customer, brand, pid, price,
    ):
        M, O, T = self.main_e, self.other_e, self.history_length
        v = self.vocab
        emb = lambda n, size, d: nn.Embed(size, d, name=f"{n}_emb")  # noqa: E731

        uid_e = emb("uid", v["user"], M)(uid)
        mid_e = emb("mid", v["adgroup_id"], M)(mid)
        cate_table = nn.Embed(v["cate"], M, name="cate_emb")
        brand_table = nn.Embed(v["brand"], M, name="brand_emb")
        cate_e, cate_his_e = cate_table(cate_id), cate_table(hist_cate)
        brand_e, brand_his_e = brand_table(brand), brand_table(hist_brand)
        btag_his_e = emb("btag", v["btag"], O)(hist_btag)
        dm_btag_his_e = emb("dm_btag", v["btag"], O)(hist_btag)
        camp_e = emb("campaign", v["campaign_id"], M)(campaign)
        cust_e = emb("customer", v["customer"], M)(customer)
        pid_e = emb("pid", v["pid"], O)(pid)
        profile_e = [
            emb(n, v[n], O)(profile[:, i])
            for i, n in enumerate(PROFILE_FIELDS)
        ]

        b = uid.shape[0]
        positions = jax.lax.broadcasted_iota(jnp.int32, (b, T), 1)
        pos_his = emb("position", T, O)(positions)
        dm_pos_his = emb("dm_position", T, O)(positions)

        user_feat = jnp.concatenate([uid_e] + profile_e, -1)
        item_his_eb = jnp.concatenate([cate_his_e, brand_his_e], -1)  # B,T,2M
        item_his_sum = (item_his_eb * mask[..., None]).sum(1)
        item_feat = jnp.concatenate(
            [mid_e, cate_e, brand_e, camp_e, cust_e, price[:, None]], -1
        )
        item_eb = jnp.concatenate([cate_e, brand_e], -1)  # (B, 2M)
        pos_ctx = jnp.concatenate([pos_his, btag_his_e], -1)  # (B,T,2O)
        dm_pos_ctx = jnp.concatenate([dm_pos_his, dm_btag_his_e], -1)

        # ---- User-to-Item deep match (net.py:239-303) ----
        q = PReLU(axis=1, name="dm_prelu")(
            nn.Dense(2 * M, name="dm_align")(dm_pos_ctx)
        )
        att_in = jnp.concatenate(
            [q, item_his_eb, q - item_his_eb, q * item_his_eb], -1
        )
        s = nn.sigmoid(nn.Dense(80, name="dm_att_1")(att_in))
        s = nn.sigmoid(nn.Dense(40, name="dm_att_2")(s))
        scores = nn.Dense(1, name="dm_att_3")(s)[..., 0]  # (B, T)
        scores = jnp.where(mask > 0, scores, -(2.0**31))
        # causal prefix softmax: row t attends to history positions ≤ t
        tiled = jnp.broadcast_to(scores[:, None, :], (b, T, T))
        causal = jnp.tril(jnp.ones((T, T), scores.dtype))
        tiled = jnp.where(causal[None] > 0, tiled, -(2.0**31))
        probs = jax.nn.softmax(tiled, axis=-1)  # (B, T, T)
        att_hist = jnp.einsum("bts,bse->bte", probs, item_his_eb)
        dnn1 = PReLU(axis=1, name="dm_fcn_prelu")(
            nn.Dense(M, name="dm_fcn_1")(att_hist)
        )  # (B, T, M)
        user_vector = dnn1[:, -1, :]
        user_vector2 = dnn1[:, -2, :] * match_mask[:, -2:-1]

        dm_item_table = nn.Embed(v["cate"], M, name="dm_item_emb")
        dm_item_bias = self.param(
            "dm_item_bias", nn.initializers.zeros, (v["cate"],)
        )
        logits_aux = (
            dm_item_table.attend(user_vector2) + dm_item_bias
        )  # (B, cate_size) — one MXU matmul against the dm item table
        aux_labels = hist_cate[:, -1]
        logp = jax.nn.log_softmax(logits_aux)
        aux_loss = -jnp.take_along_axis(
            logp, aux_labels[:, None], axis=1
        ).mean() * 0.1

        rel_u2i = jnp.sum(
            user_vector * dm_item_table(cate_id), -1, keepdims=True
        )

        # ---- Item-to-Item attention (net.py:305-357) ----
        item_tile = jnp.broadcast_to(item_eb[:, None, :], (b, T, 2 * M))
        q2 = PReLU(axis=1, name="dmr_prelu")(
            nn.Dense(2 * M, name="dmr_align")(
                jnp.concatenate([item_tile, pos_ctx], -1)
            )
        )
        att2_in = jnp.concatenate(
            [q2, item_his_eb, q2 - item_his_eb, q2 * item_his_eb], -1
        )
        s2 = nn.sigmoid(nn.Dense(80, name="tg_att_1")(att2_in))
        s2 = nn.sigmoid(nn.Dense(40, name="tg_att_2")(s2))
        scores2 = nn.Dense(1, name="tg_att_3")(s2)[..., 0]  # (B, T)
        rel_i2i = jnp.sum(
            jnp.where(mask > 0, scores2, 0.0), -1, keepdims=True
        )
        w2 = jax.nn.softmax(jnp.where(mask > 0, scores2, -(2.0**31)), -1)
        att_out = jnp.einsum("bt,bte->be", w2, item_his_eb)

        inp = jnp.concatenate(
            [
                user_feat, item_feat, pid_e, item_his_sum,
                item_eb * item_his_sum, rel_u2i, rel_i2i, att_out,
            ],
            -1,
        )
        # deviation from the reference: BatchNorm(momentum=.99) on this
        # concat (net.py:378-379) needs mutable batch stats, which the
        # one-pytree functional step avoids; LayerNorm is the stateless
        # TPU-native stand-in (documented, affects optimization dynamics)
        inp = nn.LayerNorm(name="inp_norm")(inp)
        h = inp
        for i, d in enumerate((512, 256, 128)):
            h = PReLU(name=f"prelu{i}")(nn.Dense(d, name=f"f{i}")(h))
        logit = PReLU(name="prelu3")(nn.Dense(1, name="f3")(h))[:, 0]
        return logit, aux_loss


@register_model("rank.dmr")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        h = config.hyper
        self.vocab = {
            "user": int(h("user_size", 1141730)),
            "cms_segid": int(h("cms_segid_size", 97)),
            "cms_group_id": int(h("cms_group_id_size", 13)),
            "final_gender_code": int(h("final_gender_code_size", 3)),
            "age_level": int(h("age_level_size", 7)),
            "pvalue_level": int(h("pvalue_level_size", 4)),
            "shopping_level": int(h("shopping_level_size", 4)),
            "occupation": int(h("occupation_size", 3)),
            "new_user_class_level": int(h("new_user_class_level_size", 5)),
            "adgroup_id": int(h("adgroup_id_size", 846812)),
            "cate": int(h("cate_size", 12978)),
            "campaign_id": int(h("campaign_id_size", 423437)),
            "customer": int(h("customer_size", 255876)),
            "brand": int(h("brand_size", 461529)),
            "btag": int(h("btag_size", 5)),
            "pid": int(h("pid_size", 2)),
        }
        self.history_length = int(h("history_length", 50))
        self.module = DMRNet(
            self.vocab,
            int(h("main_embedding_size", 32)),
            int(h("other_embedding_size", 8)),
            self.history_length,
        )

    def model_inputs(self, batch):
        return (
            batch["hist_btag"], batch["hist_cate"], batch["hist_brand"],
            batch["hist_mask"], batch["match_mask"], batch["profile"],
            batch["uid"], batch["mid"], batch["cate_id"], batch["campaign"],
            batch["customer"], batch["brand"], batch["pid"], batch["price"],
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        T = self.history_length
        v = self.vocab
        lens = rng.randint(1, T + 1, batch_size)
        hist_mask = (np.arange(T)[None, :] >= (T - lens[:, None])).astype(
            np.float32
        )  # histories right-aligned (most recent at T-1)
        return {
            "hist_btag": rng.randint(0, v["btag"], (batch_size, T)).astype(np.int64),
            "hist_cate": rng.randint(0, v["cate"], (batch_size, T)).astype(np.int64),
            "hist_brand": rng.randint(0, v["brand"], (batch_size, T)).astype(np.int64),
            "hist_mask": hist_mask,
            "match_mask": hist_mask.copy(),
            "profile": np.stack(
                [rng.randint(0, v[n], batch_size) for n in PROFILE_FIELDS], 1
            ).astype(np.int64),
            "uid": rng.randint(0, v["user"], batch_size).astype(np.int64),
            "mid": rng.randint(0, v["adgroup_id"], batch_size).astype(np.int64),
            "cate_id": rng.randint(0, v["cate"], batch_size).astype(np.int64),
            "campaign": rng.randint(0, v["campaign_id"], batch_size).astype(np.int64),
            "customer": rng.randint(0, v["customer"], batch_size).astype(np.int64),
            "brand": rng.randint(0, v["brand"], batch_size).astype(np.int64),
            "pid": rng.randint(0, v["pid"], batch_size).astype(np.int64),
            "price": rng.rand(batch_size).astype(np.float32),
            "label": (rng.rand(batch_size) < 0.5).astype(np.float32),
            "mask": np.ones(batch_size, np.float32),
        }

    def train_forward(self, params, batch):
        logits, aux_loss = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )
        labels = batch["label"].reshape(-1).astype(jnp.float32)
        mask = batch.get("mask")
        loss = binary_logloss(logits, labels, mask) + aux_loss
        aux: Aux = {"predictions": jax.nn.sigmoid(logits), "labels": labels}
        if mask is not None:
            aux["mask"] = mask
        return loss, aux

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        files = shard_files(
            list_data_files(data_dir), jax.process_index(), jax.process_count()
        )
        return DMRDataset(files, batch_size, self.history_length)


class DMRDataset:
    """The reference alimama format: each line is 5·T history columns
    (btag, cate, brand, mask, match_mask) then 16 scalar ids + label,
    comma-separated (net.py:395-425)."""

    def __init__(self, files, batch_size, history_length):
        self.files = files
        self.batch_size = batch_size
        self.T = history_length

    def __iter__(self):
        bs, T = self.batch_size, self.T
        buf = []
        for path in self.files:
            with open(path) as f:
                for line in f:
                    vals = line.strip().split(",")
                    if len(vals) < 5 * T + 17:
                        continue
                    buf.append([float(x) for x in vals])
                    if len(buf) == bs:
                        yield self._batch(np.asarray(buf))
                        buf = []
        if buf:
            # zero-pad the tail to the full batch (mask marks real rows):
            # one static shape per batch size — no tail recompile, dp
            # sharding over the batch axis stays divisible
            yield self._batch(np.asarray(buf), valid=len(buf), pad_to=bs)

    def _batch(self, a, valid=None, pad_to=None):
        T = self.T
        if pad_to and len(a) < pad_to:
            a = np.concatenate(
                [a, np.zeros((pad_to - len(a), a.shape[1]), a.dtype)])
        n = len(a)
        ids = a.astype(np.int64)
        scalars = ids[:, 5 * T:]
        return {
            "hist_btag": ids[:, 0:T],
            "hist_cate": ids[:, T:2 * T],
            "hist_brand": ids[:, 2 * T:3 * T],
            "hist_mask": a[:, 3 * T:4 * T].astype(np.float32),
            "match_mask": a[:, 4 * T:5 * T].astype(np.float32),
            "uid": scalars[:, 0],
            "profile": scalars[:, 1:9],
            "mid": scalars[:, 9],
            "cate_id": scalars[:, 10],
            "campaign": scalars[:, 11],
            "customer": scalars[:, 12],
            "brand": scalars[:, 13],
            "price": a[:, 5 * T + 14].astype(np.float32),
            "pid": scalars[:, 15],
            "label": a[:, 5 * T + 16].astype(np.float32),
            "mask": (np.arange(n) < (n if valid is None else valid)
                     ).astype(np.float32),
        }
