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


GENERATORS = {"din": gen_din, "mmoe": gen_mmoe, "esmm": gen_esmm,
              "ncf": gen_ncf, "dssm": gen_dssm}


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
        "dssm": dict(queries=300, test_queries=60, d=128, topics=8),
    }
    for fam in args.families:
        kw = small[fam] if args.small else {}
        meta = GENERATORS[fam](os.path.join(args.out, fam), **kw)
        print(json.dumps(meta), flush=True)


if __name__ == "__main__":
    main()
