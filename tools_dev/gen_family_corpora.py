"""Planted-signal quality corpora for the non-CTR model families
(VERDICT r3 item 2): sequence CTR (din), multitask (mmoe, esmm),
recall ranked eval (ncf), match (dssm).

Every corpus is written in the family's NATIVE reader format (the same
files the reference's readers parse) and ships a meta.json with
measured ceilings, so `tools_dev/quality_families.py` can certify each
flagship model against an achievable bound — the same discipline the
CTR benchmark applies (doc/benchmark.md).

Design per family (ceilings in meta.json):
  din   — items carry latent vectors; the label is driven by the
          softmax-attention-pooled similarity between the target and
          the history, so attention is NECESSARY: the meta records both
          bayes_auc (true probabilities) and sumpool_auc (the best any
          history-sum-pooling model can do — AUC of the mean-similarity
          scorer), and DIN must land between them, near bayes.
  mmoe  — census-format two-task corpus; both tasks share a planted
          nonlinear feature bank g(x)=tanh(Vx) with task-specific
          heads; meta records per-task bayes AUC and the linear-class
          ceiling (AUC of the best linear scorer, measuring how much of
          the signal needs the experts).
  esmm  — ali-ccp-format click/conversion with correlated additive
          feasign effects and conversion observed only on clicks (the
          ESMM identity ctcvr = ctr * cvr); meta records bayes AUC for
          ctr and ctcvr.
  ncf   — user/item latent dot-product preferences; train file holds
          sampled positives + negatives (movielens protocol), test file
          holds per-user 1 positive + 99 negatives; meta records the
          TRUE-score HR@10/NDCG@10 — the ranked-eval oracle.
  dssm  — topic-structured trigram vectors (BQ format); a "positive"
          doc shares the query's topic with prob 1-noise; meta records
          the pnr of the true-topic scorer (the bayes pnr).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from paddlerec_tpu.core.metrics import auc_from_buckets  # noqa: E402


def _auc(scores, labels):
    buckets = 1 << 14
    s = np.asarray(scores, np.float64)
    lo, hi = s.min(), s.max()
    b = np.clip(((s - lo) / max(hi - lo, 1e-12) * (buckets - 1)).astype(
        np.int64), 0, buckets - 1)
    pos = np.bincount(b, weights=labels, minlength=buckets)
    neg = np.bincount(b, weights=1 - labels, minlength=buckets)
    return float(auc_from_buckets(pos, neg))


# --------------------------------------------------------------------------
def gen_din(out, rows=240_000, test_rows=40_000, items=2000, cats=100,
            k=8, max_len=40, seed=7):
    rng = np.random.RandomState(seed)
    z = rng.randn(items, k).astype(np.float32) / np.sqrt(k)
    # calibrated so bayes lands in the reference DIN's 0.83 band while
    # the sum-pooling ceiling stays near chance (0.59): the attention
    # gap is the certificate (measured over (tau, gamma) grid)
    gamma, tau, bias = 6.0, 8.0, -3.0

    def gen_split(n, path, collect=False):
        stats = {"p": [], "y": [], "mean_rel": []}
        with open(path, "w") as f:
            done = 0
            while done < n:
                m = min(20_000, n - done)
                lens = rng.randint(5, max_len + 1, m)
                hist = rng.randint(0, items, (m, max_len))
                tgt = rng.randint(0, items, m)
                mask = np.arange(max_len)[None, :] < lens[:, None]
                rel = np.einsum("mk,mlk->ml", z[tgt], z[hist])
                rel = np.where(mask, rel, -np.inf)
                a = np.exp(tau * rel - (tau * rel).max(1, keepdims=True)
                           ) * mask
                a /= a.sum(1, keepdims=True)
                sig = (a * np.where(mask, rel, 0.0)).sum(1)
                p = 1 / (1 + np.exp(-(bias + gamma * sig)))
                y = (rng.rand(m) < p).astype(np.float32)
                mean_rel = np.where(mask, rel, 0.0).sum(1) / lens
                for i in range(m):
                    h = " ".join(map(str, hist[i, :lens[i]]))
                    c = " ".join(map(str, hist[i, :lens[i]] % cats))
                    f.write(f"{h};{c};{tgt[i]};{tgt[i] % cats};"
                            f"{int(y[i])}\n")
                if collect:
                    stats["p"].append(p)
                    stats["y"].append(y)
                    stats["mean_rel"].append(mean_rel)
                done += m
        return stats

    os.makedirs(f"{out}/train", exist_ok=True)
    os.makedirs(f"{out}/test", exist_ok=True)
    gen_split(rows, f"{out}/train/part-0.txt")
    st = gen_split(test_rows, f"{out}/test/part-0.txt", collect=True)
    p = np.concatenate(st["p"])
    y = np.concatenate(st["y"])
    mr = np.concatenate(st["mean_rel"])
    meta = {
        "family": "din", "items": items, "cats": cats, "max_len": max_len,
        "rows": rows, "test_rows": test_rows, "seed": seed,
        "bayes_auc": round(_auc(p, y), 5),
        # what a sum/mean-pooling model can extract at best: the signal
        # reduced to <z_target, mean z_history>
        "sumpool_auc": round(_auc(mr, y), 5),
        "positive_rate": round(float(y.mean()), 5),
    }
    json.dump(meta, open(f"{out}/meta.json", "w"))
    return meta


# --------------------------------------------------------------------------
def gen_mmoe(out, rows=200_000, test_rows=40_000, feats=100, hidden=16,
             seed=11):
    rng = np.random.RandomState(seed)
    V = rng.randn(feats, hidden).astype(np.float32) * (2.2 / np.sqrt(feats))
    a = rng.randn(2, hidden).astype(np.float32) * 1.6
    w_lin = rng.randn(2, feats).astype(np.float32) * (0.9 / np.sqrt(feats))
    biases = np.array([-1.0, 0.4], np.float32)  # income rarer than marital

    def score(x):
        g = np.tanh(x @ V)
        return g @ a.T + x @ w_lin.T + biases  # (m, 2): (income, marital)

    def gen_split(n, path, collect=False):
        with open(path, "w") as f:
            x = rng.randn(n, feats).astype(np.float32)
            s = score(x)
            p = 1 / (1 + np.exp(-s))
            y = (rng.rand(n, 2) < p).astype(np.float32)
            for i in range(n):
                # census CSV: col0 = marital label, col1 = income label
                f.write(",".join(
                    [str(int(y[i, 1])), str(int(y[i, 0]))]
                    + [f"{v:.4f}" for v in x[i]]) + "\n")
        return (x, s, p, y) if collect else None

    os.makedirs(f"{out}/train", exist_ok=True)
    os.makedirs(f"{out}/test", exist_ok=True)
    gen_split(rows, f"{out}/train/part-0.txt")
    x, s, p, y = gen_split(test_rows, f"{out}/test/part-0.txt", collect=True)
    # linear-class ceiling: refit the best linear scorer on the true
    # log-odds (population least squares on this split)
    meta = {"family": "mmoe", "feature_size": feats, "rows": rows,
            "test_rows": test_rows, "seed": seed}
    coef, *_ = np.linalg.lstsq(
        np.concatenate([x, np.ones((len(x), 1), np.float32)], 1),
        s, rcond=None)
    s_lin = np.concatenate([x, np.ones((len(x), 1), np.float32)], 1) @ coef
    for i, task in enumerate(("income", "marital")):
        meta[f"bayes_auc_{task}"] = round(_auc(p[:, i], y[:, i]), 5)
        meta[f"linear_auc_{task}"] = round(_auc(s_lin[:, i], y[:, i]), 5)
        meta[f"positive_rate_{task}"] = round(float(y[:, i].mean()), 5)
    json.dump(meta, open(f"{out}/meta.json", "w"))
    return meta


# --------------------------------------------------------------------------
def gen_esmm(out, rows=300_000, test_rows=50_000, vocab=20_000, fields=23,
             rho=0.6, seed=13):
    from paddlerec_tpu.models.multitask.base import ALI_CCP_FIELDS

    rng = np.random.RandomState(seed)
    w_ctr = rng.randn(vocab).astype(np.float32) * 0.28
    w_cvr = (rho * w_ctr
             + np.sqrt(1 - rho ** 2) * rng.randn(vocab) * 0.28
             ).astype(np.float32)
    b_ctr, b_cvr = -1.3, -0.6
    v_field = vocab // fields  # field-unique id ranges, like the corpus

    def gen_split(n, path, collect=False):
        st = {"pc": [], "pv": [], "click": [], "conv": [], "ids": []}
        with open(path, "w") as f:
            done = 0
            while done < n:
                m = min(50_000, n - done)
                u = rng.rand(m, fields)
                local = (v_field * u ** 2).astype(np.int64) % v_field
                ids = local + (np.arange(fields) * v_field)[None, :]
                s_ctr = w_ctr[ids].sum(1) + b_ctr
                s_cvr = w_cvr[ids].sum(1) + b_cvr
                pc = 1 / (1 + np.exp(-s_ctr))
                pv = 1 / (1 + np.exp(-s_cvr))
                click = (rng.rand(m) < pc).astype(np.float32)
                conv = click * (rng.rand(m) < pv)
                for i in range(m):
                    toks = ",".join(
                        f"{ALI_CCP_FIELDS[j]}:{ids[i, j]}"
                        for j in range(fields)
                    )
                    f.write(f"{done + i},{int(click[i])},{int(conv[i])},"
                            f"0,{toks}\n")
                if collect:
                    st["pc"].append(pc)
                    st["pv"].append(pv)
                    st["click"].append(click)
                    st["conv"].append(conv)
                    st["ids"].append(ids.astype(np.int32))
                done += m
        return st

    os.makedirs(f"{out}/train", exist_ok=True)
    os.makedirs(f"{out}/test", exist_ok=True)
    tr = gen_split(rows, f"{out}/train/part-0.txt", collect=True)
    st = gen_split(test_rows, f"{out}/test/part-0.txt", collect=True)
    pc = np.concatenate(st["pc"])
    pv = np.concatenate(st["pv"])
    click = np.concatenate(st["click"])
    conv = np.concatenate(st["conv"])
    # estimation-aware (posterior-shrinkage) ceilings, the same math as
    # tools_dev/posterior_oracle.py's additive part: w_hat = lam*w + xi,
    # lam = n/(n+kappa), kappa = 1/(I*sigma^2).  CTR effects observe
    # every row; CVR effects observe only CLICKED rows.
    rng2 = np.random.RandomState(seed + 1)
    pc_tr = np.concatenate(tr["pc"])
    pv_tr = np.concatenate(tr["pv"])
    click_tr = np.concatenate(tr["click"])
    ids_tr = np.concatenate(tr["ids"])
    counts = np.bincount(ids_tr.reshape(-1), minlength=vocab)
    counts_clicked = np.bincount(
        ids_tr[click_tr > 0].reshape(-1), minlength=vocab)
    i_ctr = float((pc_tr * (1 - pc_tr)).mean())
    i_cvr = float((pv_tr[click_tr > 0] * (1 - pv_tr[click_tr > 0])).mean())

    def shrunk(w, n, info):
        var = w.astype(np.float64) ** 2
        kap = np.where(var > 0, 1.0 / (info * np.maximum(var, 1e-12)),
                       np.inf)
        lam = n / (n + kap)
        return (lam * w + rng2.randn(len(w))
                * np.sqrt(lam * (1 - lam) * var)).astype(np.float32)

    w_ctr_hat = shrunk(w_ctr, counts, i_ctr)
    w_cvr_hat = shrunk(w_cvr, counts_clicked, i_cvr)
    ids_te = np.concatenate(st["ids"])
    o_ctr = 1 / (1 + np.exp(-(w_ctr_hat[ids_te].sum(1) + b_ctr)))
    o_ctcvr = o_ctr / (1 + np.exp(-(w_cvr_hat[ids_te].sum(1) + b_cvr)))
    meta = {
        "family": "esmm", "vocab": vocab, "fields": fields, "rows": rows,
        "test_rows": test_rows, "seed": seed, "rho": rho,
        "bayes_auc_ctr": round(_auc(pc, click), 5),
        "bayes_auc_ctcvr": round(_auc(pc * pv, conv), 5),
        "oracle_auc_ctr": round(_auc(o_ctr, click), 5),
        "oracle_auc_ctcvr": round(_auc(o_ctcvr, conv), 5),
        "click_rate": round(float(click.mean()), 5),
        "conv_rate": round(float(conv.mean()), 5),
    }
    json.dump(meta, open(f"{out}/meta.json", "w"))
    return meta


# --------------------------------------------------------------------------
def gen_ncf(out, users=3000, items=1500, k=8, pos_per_user=30, neg_ratio=4,
            test_negs=99, seed=17):
    rng = np.random.RandomState(seed)
    U = rng.randn(users, k).astype(np.float32) / np.sqrt(k)
    I = rng.randn(items, k).astype(np.float32) / np.sqrt(k)
    b_item = rng.randn(items).astype(np.float32) * 0.3
    scores = U @ I.T + b_item[None, :]  # true affinity (users, items)

    os.makedirs(f"{out}/train", exist_ok=True)
    os.makedirs(f"{out}/test", exist_ok=True)
    # per-user positives: top-heavy sample without replacement by score
    hr_true, ndcg_true = 0, 0.0
    n_tr = pos_per_user * (1 + neg_ratio)
    tr_items = np.zeros((users, n_tr), np.int64)
    tr_labels = np.zeros((users, n_tr), np.float32)
    test_cand = np.zeros((users, test_negs + 1), np.int64)
    with open(f"{out}/train/part-0.txt", "w") as ftr, \
            open(f"{out}/test/part-0.txt", "w") as fte:
        for uid in range(users):
            p = np.exp(scores[uid] * 2.0)
            p /= p.sum()
            pos = rng.choice(items, pos_per_user + 1, replace=False, p=p)
            heldout, pos = pos[0], pos[1:]
            col = 0
            for it in pos:
                ftr.write(f"{uid},{it},1\n")
                tr_items[uid, col], tr_labels[uid, col] = it, 1.0
                col += 1
                for _ in range(neg_ratio):
                    ng = rng.randint(0, items)
                    ftr.write(f"{uid},{ng},0\n")
                    tr_items[uid, col] = ng
                    col += 1
            # ranked test: heldout positive + test_negs sampled negatives
            negs = rng.choice(
                np.setdiff1d(np.arange(items), np.append(pos, heldout)),
                test_negs, replace=False)
            fte.write(f"{uid},{heldout},1\n")
            for it in negs:
                fte.write(f"{uid},{it},0\n")
            test_cand[uid] = np.append([heldout], negs)
            # oracle: rank by TRUE score
            cand = test_cand[uid]
            order = np.argsort(-scores[uid][cand])
            rank = int(np.where(order == 0)[0][0])
            if rank < 10:
                hr_true += 1
                ndcg_true += 1.0 / np.log2(rank + 2)

    # REFIT oracle (the achievable given-data ceiling): with the true
    # item vectors/biases known, refit each user's vector by logistic
    # regression on exactly its train rows, then rank the test
    # candidates.  Batched full-gradient descent across all users.
    u_hat = np.zeros((users, k), np.float32)
    v_tr = I[tr_items]                       # (U, n_tr, k)
    b_tr = b_item[tr_items]                  # (U, n_tr)
    for _ in range(300):
        logits = np.einsum("uk,unk->un", u_hat, v_tr) + b_tr
        g = (1 / (1 + np.exp(-logits)) - tr_labels)  # (U, n_tr)
        grad = np.einsum("un,unk->uk", g, v_tr) / n_tr + 0.02 * u_hat
        u_hat -= 0.5 * grad
    hr_fit, ndcg_fit = 0, 0.0
    s_fit = np.einsum("uk,unk->un", u_hat, I[test_cand]) \
        + b_item[test_cand]
    for uid in range(users):
        rank = int((s_fit[uid] > s_fit[uid, 0]).sum())
        if rank < 10:
            hr_fit += 1
            ndcg_fit += 1.0 / np.log2(rank + 2)
    meta = {
        "family": "ncf", "num_users": users, "num_items": items,
        "seed": seed, "pos_per_user": pos_per_user, "test_negs": test_negs,
        "oracle_hr10": round(hr_true / users, 5),
        "oracle_ndcg10": round(ndcg_true / users, 5),
        "refit_oracle_hr10": round(hr_fit / users, 5),
        "refit_oracle_ndcg10": round(ndcg_fit / users, 5),
    }
    json.dump(meta, open(f"{out}/meta.json", "w"))
    return meta


def gen_ncf_multi(out, users=3000, items=1500, k=8, n_interests=2,
                  pos_per_user=60, neg_ratio=4, test_negs=99, seed=37,
                  temp=3.0, sharp=1.5):
    """Multi-interest variant of the recall corpus: each user carries
    ``n_interests`` latent vectors and the TRUE affinity is the MAX over
    them — the generative assumption behind MIND's capsule routing
    (reference models/recall/mind/README.md).  A single-vector model is
    structurally unable to represent both modes, so the corpus rewards
    routing; the single-vector refit oracle (true item vectors, one
    refit vector per user) is the bar a multi-interest model must BEAT,
    and the hard-EM multi-refit oracle (true item vectors, n_interests
    refit vectors, argmax assignment) is the achievable ceiling."""
    rng = np.random.RandomState(seed)
    U = rng.randn(users, n_interests, k).astype(np.float32)
    # orthogonalize the interests per user (Gram-Schmidt) and give each
    # a fixed norm: the preference modes are genuinely distinct and a
    # single vector cannot point at both
    for j in range(1, n_interests):
        for jj in range(j):
            prev = U[:, jj]
            coef = (U[:, j] * prev).sum(1, keepdims=True) \
                / np.maximum((prev * prev).sum(1, keepdims=True), 1e-8)
            U[:, j] -= coef * prev
    U *= sharp / np.maximum(
        np.linalg.norm(U, axis=2, keepdims=True), 1e-8)
    I = rng.randn(items, k).astype(np.float32) / np.sqrt(k)
    b_item = rng.randn(items).astype(np.float32) * 0.3
    scores = np.einsum("ujk,ik->uji", U, I).max(1) + b_item[None, :]

    os.makedirs(f"{out}/train", exist_ok=True)
    os.makedirs(f"{out}/test", exist_ok=True)
    hr_true, ndcg_true = 0, 0.0
    n_tr = pos_per_user * (1 + neg_ratio)
    tr_items = np.zeros((users, n_tr), np.int64)
    tr_labels = np.zeros((users, n_tr), np.float32)
    test_cand = np.zeros((users, test_negs + 1), np.int64)
    with open(f"{out}/train/part-0.txt", "w") as ftr, \
            open(f"{out}/test/part-0.txt", "w") as fte:
        for uid in range(users):
            p = np.exp(scores[uid] * 2.0)
            p /= p.sum()
            pos = rng.choice(items, pos_per_user + 1, replace=False, p=p)
            heldout, pos = pos[0], pos[1:]
            col = 0
            for it in pos:
                ftr.write(f"{uid},{it},1\n")
                tr_items[uid, col], tr_labels[uid, col] = it, 1.0
                col += 1
                for _ in range(neg_ratio):
                    ng = rng.randint(0, items)
                    ftr.write(f"{uid},{ng},0\n")
                    tr_items[uid, col] = ng
                    col += 1
            negs = rng.choice(
                np.setdiff1d(np.arange(items), np.append(pos, heldout)),
                test_negs, replace=False)
            fte.write(f"{uid},{heldout},1\n")
            for it in negs:
                fte.write(f"{uid},{it},0\n")
            test_cand[uid] = np.append([heldout], negs)
            cand = test_cand[uid]
            order = np.argsort(-scores[uid][cand])
            rank = int(np.where(order == 0)[0][0])
            if rank < 10:
                hr_true += 1
                ndcg_true += 1.0 / np.log2(rank + 2)

    v_tr = I[tr_items]                       # (U, n_tr, k)
    b_tr = b_item[tr_items]                  # (U, n_tr)

    def ranked_eval(score_fn):
        s = score_fn(I[test_cand]) + b_item[test_cand]  # (U, G)
        hr = ndcg = 0.0
        for uid in range(users):
            rank = int((s[uid] > s[uid, 0]).sum())
            if rank < 10:
                hr += 1
                ndcg += 1.0 / np.log2(rank + 2)
        return hr / users, ndcg / users

    # single-vector refit oracle: the best any one-vector-per-user
    # model can do given the true item vectors (logistic, as gen_ncf)
    u1 = np.zeros((users, k), np.float32)
    for _ in range(300):
        logits = np.einsum("uk,unk->un", u1, v_tr) + b_tr
        g = (1 / (1 + np.exp(-logits)) - tr_labels)
        grad = np.einsum("un,unk->uk", g, v_tr) / n_tr + 0.02 * u1
        u1 -= 0.5 * grad
    hr_1, ndcg_1 = ranked_eval(
        lambda v: np.einsum("uk,ugk->ug", u1, v))

    # multi-vector hard-EM refit oracle: n_interests vectors per user,
    # each train row assigned to its argmax interest, logistic step on
    # the assigned vector only (the achievable multi-interest ceiling)
    uj = rng.randn(users, n_interests, k).astype(np.float32) * 0.1
    for _ in range(400):
        lj = np.einsum("ujk,unk->ujn", uj, v_tr)       # (U, J, n)
        j_star = lj.argmax(1)                           # (U, n)
        sel = np.eye(n_interests, dtype=np.float32)[j_star]  # (U,n,J)
        logits = lj.max(1) + b_tr
        g = (1 / (1 + np.exp(-logits)) - tr_labels)     # (U, n)
        grad = np.einsum("un,unj,unk->ujk", g, sel, v_tr) / n_tr \
            + 0.02 * uj
        uj -= 0.5 * grad
    hr_j, ndcg_j = ranked_eval(
        lambda v: np.einsum("ujk,ugk->ujg", uj, v).max(1))

    meta = {
        "family": "ncf_multi", "num_users": users, "num_items": items,
        "n_interests": n_interests, "seed": seed,
        "pos_per_user": pos_per_user, "test_negs": test_negs,
        "oracle_hr10": round(hr_true / users, 5),
        "oracle_ndcg10": round(ndcg_true / users, 5),
        "refit_oracle_hr10": round(hr_j, 5),
        "refit_oracle_ndcg10": round(ndcg_j, 5),
        "single_vec_refit_hr10": round(hr_1, 5),
        "single_vec_refit_ndcg10": round(ndcg_1, 5),
    }
    json.dump(meta, open(f"{out}/meta.json", "w"))
    return meta


# --------------------------------------------------------------------------
def gen_dssm(out, queries=24_000, test_queries=2000, topics=40, d=512,
             on_per_topic=48, noise=0.15, neg_num=1, seed=19):
    rng = np.random.RandomState(seed)
    # each topic owns a set of "on" trigram positions (overlapping)
    topic_mask = np.zeros((topics, d), np.float32)
    for t in range(topics):
        topic_mask[t, rng.choice(d, on_per_topic, replace=False)] = 1.0
    bg_p = 0.01  # background trigram noise

    def draw_vec(topic):
        v = (rng.rand(d) < bg_p).astype(np.float32)
        on = np.flatnonzero(topic_mask[topic])
        keep = on[rng.rand(len(on)) < 0.6]
        v[keep] = 1.0
        return v

    def gen_split(n, path, collect=False):
        truths = []
        with open(path, "w") as f:
            for _ in range(n):
                tq = rng.randint(topics)
                same = rng.rand() >= noise
                t_pos = tq if same else rng.randint(topics)
                t_negs = [rng.randint(topics) for _ in range(neg_num)]
                cols = [draw_vec(tq), draw_vec(t_pos)] + [
                    draw_vec(t) for t in t_negs
                ]
                f.write("\t".join(
                    ",".join(f"{x:.0f}" for x in c) for c in cols) + "\n")
                if collect:
                    truths.append((tq, t_pos, t_negs))
        return truths

    os.makedirs(f"{out}/train", exist_ok=True)
    os.makedirs(f"{out}/test", exist_ok=True)
    gen_split(queries, f"{out}/train/part-0.txt")
    truths = gen_split(test_queries, f"{out}/test/part-0.txt", collect=True)
    # bayes pnr: the true-topic scorer orders pos>neg whenever the pos
    # shares the query topic and the neg does not; ties count half
    pos_n = neg_n = eq_n = 0
    for tq, tp, tns in truths:
        sp = 1.0 if tp == tq else 0.0
        for tn in tns:
            sn = 1.0 if tn == tq else 0.0
            if sp > sn:
                pos_n += 1
            elif sp < sn:
                neg_n += 1
            else:
                eq_n += 1
    bayes_pnr = (pos_n + 0.5 * eq_n) / max(pos_n + neg_n + eq_n, 1)
    meta = {
        "family": "dssm", "trigram_d": d, "topics": topics,
        "queries": queries, "test_queries": test_queries, "seed": seed,
        "noise": noise, "neg_num": neg_num,
        "bayes_pnr": round(bayes_pnr, 5),
    }
    json.dump(meta, open(f"{out}/meta.json", "w"))
    return meta


# --------------------------------------------------------------------------
def gen_textcls(out, rows=120_000, test_rows=20_000, vocab=1000,
                min_len=16, max_len=48, alpha=0.04, beta=0.30,
                delta=0.5, lex=150, seed=23):
    """Planted text-classification corpus for the content-understanding
    family (tagspace PNR / textcnn AUC; reference
    models/contentunderstanding/{tagspace,textcnn}).

    Generative model (both ceilings exactly computable):
      * unigram mixture: token ~ (1-alpha)·q + alpha·r_y, q a Zipf base,
        r_1 / r_0 uniform over disjoint class lexicons (unigram signal);
      * first-order collocation: with prob beta (both classes) the next
        token is prev±1 cyclic, direction +1 w.p. (1+delta)/2 under
        class 1 and (1-delta)/2 under class 0 — ORDER signal no
        bag-of-words model can see, each event carrying a bounded
        log((1+delta)/(1-delta)) of evidence so Bayes stays off 1.0.
    Bayes scorer: exact sequence log-likelihood ratio under the true
    chain.  Unigram NB oracle: LLR under each class's exact stationary
    token marginal — the no-order-information reference point the
    window convs must beat.

    Writes tagspace format (``tok tok ...<TAB>tag``) and textcnn senta
    format (``tok ... seq_len label``) under out/{tagspace,textcnn}/.
    """
    rng = np.random.RandomState(seed)
    q = 1.0 / np.arange(1, vocab + 1) ** 0.8
    q /= q.sum()
    r1 = np.zeros(vocab)
    r1[rng.choice(vocab, lex, replace=False)] = 1.0 / lex
    r0 = np.zeros(vocab)
    pool = np.setdiff1d(np.arange(vocab), np.flatnonzero(r1))
    r0[rng.choice(pool, lex, replace=False)] = 1.0 / lex
    mix = np.stack([(1 - alpha) * q + alpha * r0,
                    (1 - alpha) * q + alpha * r1])  # (2, V)
    rho = np.array([(1 - delta) / 2, (1 + delta) / 2])  # P(dir=+1 | y)

    def stationary(y):
        m = mix[y].copy()
        for _ in range(200):
            m = (1 - beta) * mix[y] + beta * (
                rho[y] * np.roll(m, 1) + (1 - rho[y]) * np.roll(m, -1))
        return m

    m_stat = np.stack([stationary(0), stationary(1)])
    cum = np.cumsum(mix, axis=1)

    def gen_chunk(m):
        y = rng.randint(0, 2, m)
        lens = rng.randint(min_len, max_len + 1, m)
        toks = np.zeros((m, max_len), np.int64)
        toks[:, 0] = np.searchsorted(cum[0], rng.rand(m))
        c1 = rng.rand(m)
        toks[y == 1, 0] = np.searchsorted(cum[1], c1[y == 1])
        for t in range(1, max_len):
            fresh = np.minimum(
                np.searchsorted(cum[0], rng.rand(m)), vocab - 1)
            f1 = np.minimum(
                np.searchsorted(cum[1], rng.rand(m)), vocab - 1)
            fresh = np.where(y == 1, f1, fresh)
            direction = np.where(rng.rand(m) < rho[y], 1, -1)
            colloc = (toks[:, t - 1] + direction) % vocab
            toks[:, t] = np.where(rng.rand(m) < beta, colloc, fresh)
        toks[:, 0] = np.minimum(toks[:, 0], vocab - 1)
        return y, lens, toks

    def loglik(toks, lens, y):
        """Exact per-row sequence log-likelihood under class y."""
        m, T = toks.shape
        valid = np.arange(T)[None, :] < lens[:, None]
        ll = np.log(mix[y, toks[:, 0]])
        for t in range(1, T):
            up = toks[:, t] == (toks[:, t - 1] + 1) % vocab
            down = toks[:, t] == (toks[:, t - 1] - 1) % vocab
            step = (1 - beta) * mix[y, toks[:, t]] + beta * (
                rho[y] * up + (1 - rho[y]) * down)
            ll += np.where(valid[:, t], np.log(step), 0.0)
        return ll

    os.makedirs(f"{out}/tagspace/train", exist_ok=True)
    os.makedirs(f"{out}/tagspace/test", exist_ok=True)
    os.makedirs(f"{out}/textcnn/train", exist_ok=True)
    os.makedirs(f"{out}/textcnn/test", exist_ok=True)
    stats = {}
    for split, n in (("train", rows), ("test", test_rows)):
        f_tag = open(f"{out}/tagspace/{split}/part-0.txt", "w")
        f_cnn = open(f"{out}/textcnn/{split}/part-0.txt", "w")
        done = 0
        llrs, nb_llrs, ys = [], [], []
        while done < n:
            m = min(20_000, n - done)
            y, lens, toks = gen_chunk(m)
            if split == "test":
                llrs.append(loglik(toks, lens, np.ones(m, int))
                            - loglik(toks, lens, np.zeros(m, int)))
                lm = np.log(m_stat[1] / m_stat[0])
                valid = np.arange(max_len)[None, :] < lens[:, None]
                nb_llrs.append((lm[toks] * valid).sum(1))
                ys.append(y)
            for i in range(m):
                s = " ".join(map(str, toks[i, : lens[i]]))
                f_tag.write(f"{s}\t{y[i]}\n")
                f_cnn.write(f"{s} {lens[i]} {y[i]}\n")
            done += m
        f_tag.close()
        f_cnn.close()
        if split == "test":
            llr = np.concatenate(llrs)
            nb = np.concatenate(nb_llrs)
            yy = np.concatenate(ys)
            both = np.concatenate([llr, -llr])
            lab = np.concatenate([yy, 1 - yy])
            nb_both = np.concatenate([nb, -nb])
            stats = {
                "bayes_auc": round(_auc(llr, yy), 5),
                "unigram_nb_auc": round(_auc(nb, yy), 5),
                # tagspace's streaming pnr pools pos/neg tag sims across
                # instances: score(text, tag) = ±LLR
                "bayes_pnr": round(_auc(both, lab), 5),
                "unigram_nb_pnr": round(_auc(nb_both, lab), 5),
            }
    meta = {
        "family": "textcls", "vocab": vocab, "rows": rows,
        "test_rows": test_rows, "min_len": min_len, "max_len": max_len,
        "alpha": alpha, "beta": beta, "lex": lex, "seed": seed, **stats,
    }
    json.dump(meta, open(f"{out}/meta.json", "w"))
    return meta


# --------------------------------------------------------------------------
def gen_tdm(out, users=4000, test_users=1000, items=1500, k=8,
            hist_len=30, targets_per_user=5, tau=3.0, seed=31):
    """Planted retrieval corpus for the treebased family (TDM/JTM;
    reference models/treebased/{tdm,jtm}).

    Users and items carry latent vectors; every interaction (history
    events and the held-out target) is an independent draw from
    softmax(tau·u·z).  Lines are TDM's native ``hist... | target``.

    Ceilings written to meta.json:
      * oracle_hr10 — P(target in the TRUE top-10 by u·z): noise floor
        of the generator, unreachable without knowing u;
      * mle_oracle_hr10 — top-10 by the MLE of u from the 30-event
        history under the true item vectors: what a perfect estimator
        can get from exactly the data the model sees.
    """
    rng = np.random.RandomState(seed)
    z = rng.randn(items, k).astype(np.float64) / np.sqrt(k)
    n_all = users + test_users
    u = rng.randn(n_all, k).astype(np.float64)

    def draws(uv, n_draw):
        s = tau * (uv @ z.T)
        s -= s.max(1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(1, keepdims=True)
        cum = np.cumsum(p, 1)
        r = rng.rand(len(uv), n_draw)
        return np.stack(
            [np.searchsorted(cum[i], r[i]).clip(0, items - 1)
             for i in range(len(uv))]), p

    os.makedirs(f"{out}/train", exist_ok=True)
    os.makedirs(f"{out}/test", exist_ok=True)
    hist_all, p_all = draws(u, hist_len)
    with open(f"{out}/train/part-0.txt", "w") as f:
        tgts, _ = draws(u[:users], targets_per_user)
        for i in range(users):
            h = " ".join(map(str, hist_all[i]))
            for t in tgts[i]:
                f.write(f"{h} | {t}\n")
    test_tgt, p_test = draws(u[users:], 1)
    test_tgt = test_tgt[:, 0]
    with open(f"{out}/test/part-0.txt", "w") as f:
        for i in range(test_users):
            f.write(f"{' '.join(map(str, hist_all[users + i]))} "
                    f"| {test_tgt[i]}\n")

    # true-score oracle
    top10 = np.argsort(-p_test, 1)[:, :10]
    oracle_hr = float((top10 == test_tgt[:, None]).any(1).mean())

    # history-MLE oracle: u_hat = argmax Σ_j log softmax(tau u·z)[hist_j]
    hist_te = hist_all[users:]
    u_hat = np.zeros((test_users, k))
    zsum = z[hist_te].sum(1)  # (Nt, k)
    lr = 0.5 / hist_len
    for _ in range(300):
        s = tau * (u_hat @ z.T)
        s -= s.max(1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(1, keepdims=True)
        grad = tau * (zsum - hist_len * (p @ z))
        u_hat += lr * grad
    mle_top10 = np.argsort(-(u_hat @ z.T), 1)[:, :10]
    mle_hr = float((mle_top10 == test_tgt[:, None]).any(1).mean())

    meta = {
        "family": "tdm", "users": users, "test_users": test_users,
        "items": items, "k": k, "hist_len": hist_len, "tau": tau,
        "targets_per_user": targets_per_user, "seed": seed,
        "oracle_hr10": round(oracle_hr, 5),
        "mle_oracle_hr10": round(mle_hr, 5),
    }
    json.dump(meta, open(f"{out}/meta.json", "w"))
    return meta


GENERATORS = {"din": gen_din, "mmoe": gen_mmoe, "esmm": gen_esmm,
              "ncf": gen_ncf, "ncf_multi": gen_ncf_multi,
              "dssm": gen_dssm, "textcls": gen_textcls,
              "tdm": gen_tdm}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--families", nargs="*", default=list(GENERATORS))
    ap.add_argument("--small", action="store_true",
                    help="tiny corpora for smoke tests")
    args = ap.parse_args()
    small = {
        "din": dict(rows=2000, test_rows=500, items=200),
        "mmoe": dict(rows=2000, test_rows=500),
        "esmm": dict(rows=3000, test_rows=600, vocab=2300),
        "ncf": dict(users=50, items=100, pos_per_user=5, test_negs=20),
        "ncf_multi": dict(users=50, items=100, pos_per_user=5,
                          test_negs=20),
        "dssm": dict(queries=300, test_queries=60, d=128, topics=8),
        "textcls": dict(rows=2000, test_rows=500, vocab=300, lex=60),
        "tdm": dict(users=80, test_users=40, items=64, hist_len=12,
                    targets_per_user=2),
    }
    for fam in args.families:
        kw = small[fam] if args.small else {}
        meta = GENERATORS[fam](os.path.join(args.out, fam), **kw)
        print(json.dumps(meta), flush=True)


if __name__ == "__main__":
    main()
