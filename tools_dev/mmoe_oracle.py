"""Estimation-aware achievable ceiling for the mmoe family corpus.

The esmm row's ceiling came from per-feasign posterior shrinkage with
Fisher info (`posterior_oracle.py`); the mmoe corpus is DENSE
(x ~ N(0,I), score_t = a_t.tanh(xV) + w_t.x + b_t, gen_family_corpora
.gen_mmoe), so the analog is the asymptotic posterior over the planted
parameters themselves: the best any estimator can know about
theta = (V shared, a_t, w_t, b_t) after n train rows is
theta_hat ~ N(theta, F^-1) with F the JOINT per-task-summed Fisher

    F = sum_t sum_i  p_ti (1-p_ti)  g_ti g_ti^T,
    g_ti = d score_t(x_i) / d theta

(V's block accumulates BOTH tasks' information — the corpus's planted
transfer structure, the thing mmoe's shared experts exist to exploit).
The ceiling is then the expected test AUC of the plug-in scorer
s(x; theta + dtheta) over draws dtheta ~ N(0, F^-1): one consistent
parameter error per draw, scored on the whole test split, like a real
fitted model — not per-point independent noise.

usage: python tools_dev/mmoe_oracle.py [corpus_dir] [n_draws]

Verifies the replayed generator against meta.json (bayes AUC must
match) before trusting anything.
"""
import json
import os
import sys

import numpy as np


def _auc(scores, labels):
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # midranks for ties
    s_sorted = scores[order]
    i = 0
    while i < len(s_sorted):
        j = i
        while j + 1 < len(s_sorted) and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = (i + j) / 2.0 + 1
        i = j + 1
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def replay_params(seed=11, feats=100, hidden=16):
    """The exact draw order of gen_family_corpora.gen_mmoe."""
    rng = np.random.RandomState(seed)
    V = rng.randn(feats, hidden).astype(np.float32) * (2.2 / np.sqrt(feats))
    a = rng.randn(2, hidden).astype(np.float32) * 1.6
    w_lin = rng.randn(2, feats).astype(np.float32) * (0.9 / np.sqrt(feats))
    biases = np.array([-1.0, 0.4], np.float32)
    return V, a, w_lin, biases


def load_split(path, feats):
    raw = np.loadtxt(path, delimiter=",", dtype=np.float32)
    # CSV layout (gen_mmoe): col0 = marital label, col1 = income label
    y = np.stack([raw[:, 1], raw[:, 0]], axis=1)  # -> (income, marital)
    return raw[:, 2:2 + feats], y


def score(x, V, a, w_lin, biases):
    return np.tanh(x @ V) @ a.T + x @ w_lin.T + biases  # (m, 2)


def joint_fisher(x, V, a, w_lin, biases, chunk=8192):
    """F over theta = (vec(V), a_0, a_1, w_0, w_1, b_0, b_1)."""
    feats, hidden = V.shape
    dim = feats * hidden + 2 * hidden + 2 * feats + 2
    F = np.zeros((dim, dim), np.float64)
    s_all = score(x, V, a, w_lin, biases)
    p_all = 1.0 / (1.0 + np.exp(-s_all))
    lam_all = p_all * (1 - p_all)  # (n, 2) Fisher weights
    o_a = feats * hidden            # offsets into theta
    o_w = o_a + 2 * hidden
    o_b = o_w + 2 * feats
    for lo in range(0, len(x), chunk):
        xb = x[lo:lo + chunk].astype(np.float64)
        h = np.tanh(xb @ V)                    # (m, H)
        dh = 1.0 - h * h                       # (m, H)
        for t in range(2):
            m = len(xb)
            g = np.zeros((m, dim), np.float64)
            # dV: outer(x, a_t * (1 - h^2))  -> vec row-major (feats*hidden)
            gv = xb[:, :, None] * (dh * a[t])[:, None, :]  # (m, F, H)
            g[:, :o_a] = gv.reshape(m, -1)
            g[:, o_a + t * hidden: o_a + (t + 1) * hidden] = h
            g[:, o_w + t * feats: o_w + (t + 1) * feats] = xb
            g[:, o_b + t] = 1.0
            gw = g * np.sqrt(lam_all[lo:lo + chunk, t])[:, None]
            F += gw.T @ gw
    return F


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/family_bench/mmoe"
    n_draws = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    meta = json.load(open(os.path.join(corpus, "meta.json")))
    feats, hidden = meta["feature_size"], 16
    V, a, w_lin, biases = replay_params(meta["seed"], feats, hidden)
    xte, yte = load_split(os.path.join(corpus, "test", "part-0.txt"), feats)
    s_true = score(xte, V, a, w_lin, biases)
    # replay check: planted params + file x must reproduce meta's bayes
    for t, task in enumerate(("income", "marital")):
        got = _auc(s_true[:, t], yte[:, t])
        want = meta[f"bayes_auc_{task}"]
        assert abs(got - want) < 2e-3, (task, got, want)
    print(f"replay ok: bayes {', '.join(f'{_auc(s_true[:, t], yte[:, t]):.5f}' for t in range(2))}",
          flush=True)

    xtr, _ = load_split(os.path.join(corpus, "train", "part-0.txt"), feats)
    F = joint_fisher(xtr, V, a, w_lin, biases)
    dim = F.shape[0]
    # posterior covariance = F^-1 (Jeffreys/asymptotic); tiny jitter for
    # the Cholesky of a 1834-dim empirical matrix
    L = np.linalg.cholesky(np.linalg.inv(F + np.eye(dim) * 1e-8))
    print(f"fisher dim={dim}, n={len(xtr)} rows x 2 tasks", flush=True)

    o_a = feats * hidden
    o_w = o_a + 2 * hidden
    o_b = o_w + 2 * feats
    rng = np.random.RandomState(0)
    aucs = np.zeros((n_draws, 2))
    for k in range(n_draws):
        d = L @ rng.randn(dim)
        Vk = V + d[:o_a].reshape(feats, hidden).astype(np.float32)
        ak = a + d[o_a:o_w].reshape(2, hidden).astype(np.float32)
        wk = w_lin + d[o_w:o_b].reshape(2, feats).astype(np.float32)
        bk = biases + d[o_b:].astype(np.float32)
        sk = score(xte, Vk, ak, wk, bk)
        for t in range(2):
            aucs[k, t] = _auc(sk[:, t], yte[:, t])
    out = {"corpus": corpus, "n_draws": n_draws, "fisher_dim": dim}
    for t, task in enumerate(("income", "marital")):
        out[f"bayes_{task}"] = meta[f"bayes_auc_{task}"]
        out[f"oracle_{task}"] = round(float(aucs[:, t].mean()), 5)
        out[f"oracle_{task}_std"] = round(float(aucs[:, t].std()), 5)
    print("MMOE_ORACLE " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
