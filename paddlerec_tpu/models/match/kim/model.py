"""KIM: knowledge-aware interactive matching for news recommendation.

Parity target: reference models/match/kim/net.py:27-440 —
  * ContextEncoder (net.py:128-153): word embedding → (conv1d-400 relu)
    + (20×20-head self-attention relu), summed;
  * word-level co-attention between every clicked title and the
    candidate title with 0.001-scaled cross terms (net.py:287-330);
  * entity level: per clicked news, the user's entity graph (10 zero-hop
    entities + 10×10 one-hop neighbors, pre-embedded 100-d KG vectors)
    co-attends with the candidate's graph through GraphCoAttNet
    (net.py:97-125) twice (one-hop fusion then zero-hop match,
    net.py:168-247);
  * news-level co-attention over the 50 clicked news with 0.01-scaled
    cross terms → user/news vectors → dot score (net.py:366-398);
  * training scores 1+npratio candidates (net.py:427-435) with softmax
    CE; eval is the pairwise 正序率 protocol.

Known reference slips reproduced the *intended* way: ``news_can`` fuses
the news zero-hop (not user, net.py:210) and the news-side attention uses
``news_att1`` (not user_att1, net.py:370).

TPU-first: candidates run under ``jax.vmap`` instead of a Python loop;
every per-clicked-news submodule call is a reshaped batched call.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import register_model
from paddlerec_tpu.models.base import Aux, ModelDef

ENT_DIM = 100  # KG entity embedding width (fixed in the reference)


class SelfAttention(nn.Module):
    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, q, k, v):
        b, t, _ = q.shape
        h, hd = self.heads, self.head_dim
        qp = nn.Dense(h * hd, use_bias=False, name="wq")(q)
        kp = nn.Dense(h * hd, use_bias=False, name="wk")(k)
        vp = nn.Dense(h * hd, use_bias=False, name="wv")(v)

        def split(x):
            return x.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)

        a = jnp.einsum(
            "bhqd,bhkd->bhqk", split(qp), split(kp)
        ) / hd**0.5
        a = jax.nn.softmax(a, -1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, split(vp))
        return o.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


class AttentivePooling(nn.Module):
    @nn.compact
    def __call__(self, x):  # (..., N, D) → (..., D)
        a = nn.Dense(1, name="fc2")(jnp.tanh(nn.Dense(200, name="fc1")(x)))
        a = jax.nn.softmax(a, axis=-2)
        return (x * a).sum(-2)


class GraphCoAttNet(nn.Module):
    """net.py:97-125: self-attend entities, co-attend with candidates."""

    @nn.compact
    def __call__(self, x):  # (B, 2N, 100) — first half entities, second cand
        ent, cand = jnp.split(x, 2, axis=-2)
        ev = SelfAttention(5, 20, name="attn")(ent, ent, ent)
        s = jnp.einsum(
            "bnd,bmd->bnm",
            nn.Dense(ENT_DIM, name="d1")(ev),
            nn.Dense(ENT_DIM, name="d2")(cand),
        )
        att = jnp.tanh(
            nn.Dense(ENT_DIM, name="d3")(ev) + jnp.einsum("bnm,bmd->bnd", s, cand)
        )
        att = nn.Dense(1, name="d5")(att)
        return (ev * att).sum(-2)  # (B, 100)


class PairGraph(nn.Module):
    """Entity-graph matching of one (clicked news, candidate news) pair
    (PairPair, net.py:168-247).  Input (B, 2·(E²+E), 100)."""

    max_entity: int

    @nn.compact
    def __call__(self, x):
        e = self.max_entity
        user_in, news_in = jnp.split(x, 2, axis=-2)
        encoder = AttentivePooling(name="entity_encoder")
        gat_fuse = nn.Dense(ENT_DIM, name="gat_fuse")
        gcat = GraphCoAttNet(name="gcat")
        merge = nn.Dense(ENT_DIM, name="merge")
        gcat0 = GraphCoAttNet(name="gcat0")
        b = x.shape[0]

        def hops(part):
            onehop = part[..., : e * e, :].reshape(-1, e, e, ENT_DIM)
            zerohop = part[..., e * e :, :]  # (B, E, 100)
            return onehop, zerohop

        u_one, u_zero = hops(user_in)
        n_one, n_zero = hops(news_in)

        def fused(onehop, zerohop):
            pooled = encoder(onehop.reshape(b * e, e, ENT_DIM)).reshape(
                b, e, ENT_DIM
            )
            f = gat_fuse(jnp.concatenate([pooled, zerohop], -1))  # (B,E,100)
            # every entity row sees the full fused set of the other side
            return jnp.broadcast_to(
                f.reshape(b, 1, e, ENT_DIM), (b, e, e, ENT_DIM)
            )

        u_can = fused(u_one, u_zero)
        n_can = fused(n_one, n_zero)

        def graph_match(onehop, other_can):
            joined = jnp.concatenate([onehop, other_can], -2)  # (B,E,2E,100)
            return gcat(joined.reshape(b * e, 2 * e, ENT_DIM)).reshape(
                b, e, ENT_DIM
            )

        u_vecs = merge(
            jnp.concatenate([u_zero, graph_match(u_one, n_can)], -1)
        )
        n_vecs = merge(
            jnp.concatenate([n_zero, graph_match(n_one, u_can)], -1)
        )
        u_vec = gcat0(jnp.concatenate([u_vecs, n_zero], -2))
        n_vec = gcat0(jnp.concatenate([n_vecs, u_zero], -2))
        return jnp.concatenate([u_vec, n_vec], -1)  # (B, 200)


class PairScorer(nn.Module):
    """Score one candidate against the full click history
    (PairModel, net.py:250-400)."""

    vocab_size: int
    embedding_size: int = 300
    hidden_size: int = 400
    max_sents: int = 50
    max_sentence: int = 30
    max_entity: int = 10

    @nn.compact
    def __call__(
        self, title, entity, one_hop, clicked_title, clicked_entity,
        clicked_one_hop,
    ):
        """title (B, W); entity (B, E, 100); one_hop (B, E, E, 100);
        clicked_* add a leading (B, S, ...) sents axis."""
        s, w, e = self.max_sents, self.max_sentence, self.max_entity
        b = title.shape[0]
        word_emb = nn.Embed(
            self.vocab_size, self.embedding_size, name="title_word_embedding"
        )
        conv = nn.Conv(self.hidden_size, (3,), padding="SAME", name="conv")
        # reference fixes 20×20=400; scale head_dim with hidden_size so
        # smaller configs stay consistent (attn output == conv output)
        heads = 20 if self.hidden_size % 20 == 0 else 4
        attn = SelfAttention(heads, self.hidden_size // heads,
                             name="word_attn")

        def encode(tokens):  # (N, W) → (N, W, 400)
            wv = word_emb(tokens)
            return nn.relu(conv(wv)) + nn.relu(attn(wv, wv, wv))

        clicked_wv = encode(clicked_title.reshape(b * s, w)).reshape(
            b, s, w, self.hidden_size
        )
        candi_wv = encode(title)  # (B, W, 400)

        attn1 = nn.Dense(200, name="attn_fc1")
        attn2 = nn.Dense(1, name="attn_fc2")
        clicked_av = jnp.tanh(attn1(clicked_wv))  # (B,S,W,200)
        clicked_att = attn2(clicked_av)[..., 0]  # (B,S,W)
        candi_av = jnp.tanh(attn1(candi_wv))  # (B,W,200)
        candi_att0 = attn2(candi_av)[..., 0]  # (B,W)

        # word-level cross attention (net.py:296-321)
        cross = jnp.einsum(
            "bswd,bvd->bswv", clicked_av, candi_av
        )  # (B,S,W,W')
        cross_candi = jax.nn.softmax(cross, -1) @ candi_att0[:, None, :, None]
        clicked_att = jax.nn.softmax(
            clicked_att + cross_candi[..., 0] * 0.001, -1
        )
        cross_click = (
            cross.transpose(0, 1, 3, 2) * clicked_att[:, :, None, :]
        ).sum(-1) * 0.001  # (B,S,W')
        candi_att = jax.nn.softmax(
            candi_att0[:, None, :] + cross_click, -1
        )  # (B,S,W')
        candi_title_vecs = jnp.einsum("bsv,bvd->bsd", candi_att, candi_wv)
        clicked_title_vecs = jnp.einsum(
            "bsw,bswd->bsd", clicked_att, clicked_wv
        )

        # entity graphs per clicked news (net.py:332-358)
        clicked_graph = jnp.concatenate(
            [
                clicked_one_hop.reshape(b, s, e * e, ENT_DIM),
                clicked_entity,
            ],
            -2,
        )  # (B,S,E²+E,100)
        news_graph = jnp.concatenate(
            [one_hop.reshape(b, e * e, ENT_DIM), entity], -2
        )
        news_graph = jnp.broadcast_to(
            news_graph[:, None], (b, s) + news_graph.shape[1:]
        )
        pair_in = jnp.concatenate([clicked_graph, news_graph], -2)
        pair_out = PairGraph(e, name="pair_graph")(
            pair_in.reshape(b * s, -1, ENT_DIM)
        ).reshape(b, s, 2 * ENT_DIM)
        user_ent, news_ent = jnp.split(pair_out, 2, -1)

        merge = nn.Dense(self.hidden_size, name="merge_layer")
        user_vecs = merge(jnp.concatenate([clicked_title_vecs, user_ent], -1))
        news_vecs = merge(jnp.concatenate([candi_title_vecs, news_ent], -1))

        # news-level co-attention (net.py:366-396)
        match_att = nn.Dense(1, name="match_fc2")
        match_hidden = nn.Dense(ENT_DIM, name="match_fc1")
        u_att1 = match_att(jnp.tanh(match_hidden(user_vecs)))  # (B,S,1)
        n_att1 = match_att(jnp.tanh(match_hidden(news_vecs)))
        reduce = nn.Dense(ENT_DIM, name="match_reduce")
        cross2 = jnp.einsum(
            "bsd,btd->bst", reduce(user_vecs), reduce(news_vecs)
        )
        u_att = jax.nn.softmax(
            u_att1[..., 0]
            + (jax.nn.softmax(cross2, -1) @ n_att1)[..., 0] * 0.01,
            -1,
        )
        n_att = jax.nn.softmax(
            n_att1[..., 0]
            + (jax.nn.softmax(cross2.transpose(0, 2, 1), -1) @ u_att1)[..., 0]
            * 0.01,
            -1,
        )
        user_vec = jnp.einsum("bs,bsd->bd", u_att, user_vecs)
        news_vec = jnp.einsum("bs,bsd->bd", n_att, news_vecs)
        return (user_vec * news_vec).sum(-1)  # (B,)


class KIMNet(nn.Module):
    vocab_size: int
    embedding_size: int = 300
    hidden_size: int = 400
    max_sents: int = 50
    max_sentence: int = 30
    max_entity: int = 10

    @nn.compact
    def __call__(
        self, titles, entities, one_hops, clicked_title, clicked_entity,
        clicked_one_hop,
    ):
        """titles (B, C, W) — C candidates scored against one history."""
        scorer = PairScorer(
            self.vocab_size, self.embedding_size, self.hidden_size,
            self.max_sents, self.max_sentence, self.max_entity,
            name="pair_model",
        )
        scores = []
        for c in range(titles.shape[1]):
            scores.append(
                scorer(
                    titles[:, c], entities[:, c], one_hops[:, c],
                    clicked_title, clicked_entity, clicked_one_hop,
                )
            )
        return jnp.stack(scores, -1)  # (B, C)


@register_model("match.kim")
class ModelDef(ModelDef):
    metric_names = ("auc",)

    def __init__(self, config: Config):
        super().__init__(config)
        h = config.hyper
        self.vocab_size = int(h("vocab_size", 1891))
        self.max_sents = int(h("max_sents", 50))
        self.max_sentence = int(h("max_sentence", 30))
        self.max_entity = int(h("max_entity_num", 10))
        self.npratio = int(h("npratio", 4))
        self.module = KIMNet(
            self.vocab_size,
            int(h("embedding_size", 300)),
            int(h("hidden_size", 400)),
            self.max_sents,
            self.max_sentence,
            self.max_entity,
        )

    def model_inputs(self, batch):
        return (
            batch["titles"], batch["entities"], batch["one_hops"],
            batch["clicked_title"], batch["clicked_entity"],
            batch["clicked_one_hop"],
        )

    def example_batch(self, batch_size: int):
        rng = np.random.RandomState(0)
        c = 1 + self.npratio
        s, w, e = self.max_sents, self.max_sentence, self.max_entity
        labels = np.zeros((batch_size, c), np.float32)
        labels[:, 0] = 1.0
        return {
            "titles": rng.randint(0, self.vocab_size, (batch_size, c, w)
                                  ).astype(np.int64),
            "entities": rng.randn(batch_size, c, e, ENT_DIM).astype(np.float32),
            "one_hops": rng.randn(batch_size, c, e, e, ENT_DIM
                                  ).astype(np.float32),
            "clicked_title": rng.randint(
                0, self.vocab_size, (batch_size, s, w)
            ).astype(np.int64),
            "clicked_entity": rng.randn(batch_size, s, e, ENT_DIM
                                        ).astype(np.float32),
            "clicked_one_hop": rng.randn(
                batch_size, s, e, e, ENT_DIM
            ).astype(np.float32),
            "labels": labels,
        }

    def train_forward(self, params, batch):
        scores = self.module.apply(
            {"params": params}, *self.model_inputs(batch)
        )  # (B, C)
        labels = batch["labels"].astype(jnp.float32)
        per = -(labels * jax.nn.log_softmax(scores, -1)).sum(-1)
        mask = batch.get("mask")
        if mask is not None:
            loss = (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        else:
            loss = per.mean()
        aux: Aux = {
            "predictions": jax.nn.sigmoid(scores).reshape(-1),
            "labels": labels.reshape(-1),
        }
        if mask is not None:
            c = scores.shape[1]
            aux["mask"] = jnp.repeat(mask[:, None], c, 1).reshape(-1)
        return loss, aux

    def make_dataset(self, data_dir, batch_size, shuffle=False):
        from paddlerec_tpu.data.slot_reader import list_data_files, shard_files

        files = shard_files(
            list_data_files(data_dir), jax.process_index(),
            jax.process_count(),
        )
        return KIMDataset(self, data_dir, files, batch_size)


class KIMDataset:
    """News-matching reader — the reference's MIND pipeline
    (match/kim/mind_reader.py:36-76) reduced to numeric files so no
    nltk/KG preprocessing happens at train time.  The data dir holds

      news.tsv       ``news_id<TAB>tok tok ...<TAB>ent ent ...``
      graph.tsv      ``ent neigh neigh ...``      (one-hop KG neighbours)
      entity_emb.npy (num_entities, 100) float32  (KG entity vectors)
      behaviors.tsv  ``clicked,ids<TAB>pos<TAB>neg,neg,...``

    Each behavior row becomes 1 + npratio candidates (positive first,
    ``labels[:, 0] = 1`` as in get_train_input), titles padded to
    max_sentence tokens, entity sets to max_entity, and one-hop tensors
    gathering each entity's neighbour vectors."""

    def __init__(self, md, data_dir, files, batch_size):
        import os as _os

        self.md = md
        self.batch_size = batch_size
        self.behaviors = [
            f for f in files if _os.path.basename(f).startswith("behaviors")
        ]
        root = data_dir
        self.emb = np.load(_os.path.join(root, "entity_emb.npy")).astype(
            np.float32
        )
        e, w = md.max_entity, md.max_sentence
        self.news = {}
        with open(_os.path.join(root, "news.tsv")) as f:
            for line in f:
                nid, toks, ents = line.rstrip("\n").split("\t")
                title = np.zeros(w, np.int64)
                tt = [int(x) % md.vocab_size for x in toks.split()][:w]
                title[: len(tt)] = tt
                ent = np.zeros(e, np.int64)
                ee = [int(x) % len(self.emb) for x in ents.split()][:e]
                ent[: len(ee)] = ee
                self.news[nid] = (title, ent)
        self.graph = {}
        with open(_os.path.join(root, "graph.tsv")) as f:
            for line in f:
                toks = line.split()
                if not toks:
                    continue
                nb = np.zeros(e, np.int64)
                ns = [int(x) % len(self.emb) for x in toks[1:]][:e]
                nb[: len(ns)] = ns
                self.graph[int(toks[0]) % len(self.emb)] = nb

    def _news_feats(self, nid):
        title, ent = self.news[nid]
        e = self.md.max_entity
        vecs = self.emb[ent]  # (e, D)
        zero = np.zeros(e, np.int64)
        hops = self.emb[
            np.stack([self.graph.get(int(x), zero) for x in ent])
        ]  # (e, e, D)
        return title, ent, vecs, hops

    def __iter__(self):
        md = self.md
        c, s = 1 + md.npratio, md.max_sents
        buf = []
        for path in self.behaviors:
            with open(path) as f:
                for line in f:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) < 3:
                        continue
                    clicked = [x for x in parts[0].split(",") if x in self.news]
                    negs = [x for x in parts[2].split(",") if x in self.news]
                    if parts[1] not in self.news or not clicked or not negs:
                        continue  # no negatives -> no softmax contrast
                    # cycle REAL negatives up to npratio (padding with the
                    # positive labeled 0 would create contradictory targets)
                    negs = (negs * md.npratio)[: md.npratio]
                    cands = ([parts[1]] + negs)[:c]
                    buf.append((clicked[-s:], cands))
                    if len(buf) == self.batch_size:
                        yield self._batch(buf, self.batch_size)
                        buf = []
        if buf:
            yield self._batch(buf, self.batch_size)

    def _batch(self, rows, batch_size=None):
        md = self.md
        n = batch_size or len(rows)  # pad the tail to the static batch
        c, s = 1 + md.npratio, md.max_sents
        e, w, d = md.max_entity, md.max_sentence, self.emb.shape[1]
        out = {
            "titles": np.zeros((n, c, w), np.int64),
            "entities": np.zeros((n, c, e, d), np.float32),
            "one_hops": np.zeros((n, c, e, e, d), np.float32),
            "clicked_title": np.zeros((n, s, w), np.int64),
            "clicked_entity": np.zeros((n, s, e, d), np.float32),
            "clicked_one_hop": np.zeros((n, s, e, e, d), np.float32),
            "labels": np.zeros((n, c), np.float32),
        }
        out["labels"][: len(rows), 0] = 1.0
        out["mask"] = np.zeros((n,), np.float32)
        out["mask"][: len(rows)] = 1.0
        for i, (clicked, cands) in enumerate(rows):
            for j, nid in enumerate(cands):
                title, _, vecs, hops = self._news_feats(nid)
                out["titles"][i, j] = title
                out["entities"][i, j] = vecs
                out["one_hops"][i, j] = hops
            for j, nid in enumerate(clicked):
                title, _, vecs, hops = self._news_feats(nid)
                out["clicked_title"][i, j] = title
                out["clicked_entity"][i, j] = vecs
                out["clicked_one_hop"][i, j] = hops
        return out
