"""Calibrate the v2 synthetic-Criteo generator (VERDICT r2 item 1b).

Goal: a corpus whose signal concentrates on OBSERVABLE ids, so that the
estimation-aware ceiling (posterior_oracle.py) is Criteo-like (~0.80)
and a well-trained model can actually reach it -- making the benchmark
discriminative instead of dominated by unlearnable tail effects.

v2 planted-effect law (reproduced by gen_criteo_scale.py --freq_weight
and posterior_oracle.py):
    w[s,i]  = N(0,1) * 0.25 * scale_w  * sqrt(n_bar_i/(n_bar_i+kw))
    lat[i,:]= N(0,1) * 0.35 * scale_l  * sqrt(12 n_bar_i/(12 n_bar_i+kl))
where n_bar_i is the EXPECTED per-slot train count of id i under the
u^3 skew.  kw/kl are set to the learnability kappas (1/(I*sigma^2)) so
planted signal decays exactly where estimation becomes impossible.

This script simulates score space only (no file IO): draws rows,
computes Bayes / posterior-oracle / additive-only(LR-ceiling) scores,
and prints their AUCs for a grid of scales.

usage: python tools_dev/calibrate_gen.py [sim_rows] [train_rows]
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from paddlerec_tpu.core.metrics import auc_from_buckets  # noqa: E402

S, D, V = 26, 13, 1_000_001
PAIR_SLOTS = [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11)]


def expected_count(i, rows_per_slot):
    i = np.asarray(i, np.float64)
    p = ((i + 1.0) ** (1 / 3) - i ** (1 / 3)) / float(V) ** (1 / 3)
    return rows_per_slot * p


def bucket_auc(score, y, buckets=1 << 12):
    pr = 1 / (1 + np.exp(-score))
    b = np.clip((pr * buckets).astype(np.int64), 0, buckets - 1)
    pos = np.bincount(b, weights=y, minlength=buckets)
    neg = np.bincount(b, weights=1 - y, minlength=buckets)
    return float(auc_from_buckets(pos, neg))


def run(scale_w, scale_l, sim_rows, train_rows, kw, kl, seed=2023):
    rng = np.random.RandomState(seed)
    n_bar = expected_count(np.arange(V), train_rows)
    fw = np.sqrt(n_bar / (n_bar + kw)).astype(np.float32)
    fl = np.sqrt(12 * n_bar / (12 * n_bar + kl)).astype(np.float32)
    w = (rng.randn(S, V) * 0.25 * scale_w).astype(np.float32) * fw[None, :]
    lat = (rng.randn(V, 4) * 0.35 * scale_l).astype(np.float32) * fl[:, None]
    beta = (rng.randn(D) * 0.3).astype(np.float32)
    bias = -1.1

    r = np.random.RandomState(seed + 99)
    u = r.rand(sim_rows, S)
    ids = (V * u ** 3).astype(np.int64) % V
    dense = r.rand(sim_rows, D).astype(np.float32)
    s_add = w[np.arange(S)[None, :], ids].sum(1)
    s_pair = np.zeros(sim_rows, np.float32)
    for a, b in PAIR_SLOTS:
        s_pair += (lat[ids[:, a]] * lat[ids[:, b]]).sum(1)
    s_dense = dense @ beta + bias
    s_bayes = s_add + s_pair + s_dense
    p = 1 / (1 + np.exp(-s_bayes))
    y = (r.rand(sim_rows) < p).astype(np.float64)
    I = float((p * (1 - p)).mean())

    # posterior-oracle score using EXPECTED counts (calibration approx)
    var_w = w.astype(np.float64) ** 2
    kap_w = np.where(var_w > 0, 1.0 / (I * np.maximum(var_w, 1e-12)), np.inf)
    lam_w = n_bar[None, :] / (n_bar[None, :] + kap_w)
    nz = rng.randn(S, V)
    w_post = (lam_w * w + nz * np.sqrt(lam_w * (1 - lam_w) * var_w)).astype(
        np.float32)
    var_l = (lat.astype(np.float64) ** 2).mean(1, keepdims=True)
    mean_var_l = float((lat.astype(np.float64) ** 2).mean())
    kap_l = np.where(var_l > 0, 1.0 / (I * mean_var_l * np.maximum(var_l, 1e-12)),
                     np.inf)
    n_l = (12 * n_bar)[:, None]
    lam_l = n_l / (n_l + kap_l)
    nzl = rng.randn(V, 4)
    lat_post = (lam_l * lat + nzl * np.sqrt(lam_l * (1 - lam_l) * var_l)).astype(
        np.float32)

    s_o = w_post[np.arange(S)[None, :], ids].sum(1) + s_dense
    for a, b in PAIR_SLOTS:
        s_o += (lat_post[ids[:, a]] * lat_post[ids[:, b]]).sum(1)
    # LR ceiling: additive posterior part only (no pairwise capacity)
    s_lr = w_post[np.arange(S)[None, :], ids].sum(1) + s_dense

    return {
        "scale_w": scale_w, "scale_l": scale_l, "I": round(I, 4),
        "bayes": round(bucket_auc(s_bayes, y), 4),
        "oracle": round(bucket_auc(s_o, y), 4),
        "lr_ceiling": round(bucket_auc(s_lr, y), 4),
        "pair_var_share": round(float(np.var(s_pair) /
                                      (np.var(s_add) + np.var(s_pair) +
                                       np.var(dense @ beta))), 3),
    }


def main():
    sim_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    train_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 45_800_000
    # learnability kappas at the BASE prior scales (I~0.23)
    kw0 = 1.0 / (0.23 * 0.25 ** 2)      # ~70
    kl0 = 1.0 / (0.23 * 0.35 ** 2 * 0.35 ** 2)  # partner^2 * prior
    grid = [(1.0, 1.0, 1), (1.5, 1.5, 1), (2.0, 2.0, 1), (2.5, 2.0, 1),
            # harder frequency concentration: kappa multiplier pushes the
            # planted signal onto ids with enough observations that a
            # real SGD learner (not just the oracle) can estimate them
            (2.0, 2.0, 3), (2.5, 2.5, 3), (3.0, 3.0, 3),
            (2.5, 2.5, 10), (3.0, 3.0, 10), (3.5, 3.5, 10)]
    for scale_w, scale_l, km in grid:
        r = run(scale_w, scale_l, sim_rows, train_rows, kw0 * km, kl0 * km)
        r["kappa_mult"] = km
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
