"""Estimation-aware achievable ceiling for the synthetic Criteo-scale
corpus (VERDICT r2 item 1a).

Round 2's "seen-ids ceiling" assumed EXACT knowledge of every planted
effect seen >= min_count times -- unobtainable from a handful of
Bernoulli draws.  This script computes what the *ideal Bayesian
learner* (posterior mean under the true generative prior) actually
achieves given only the train-split observations:

  * each (slot,id) scalar effect w ~ N(0, sigma_w^2) observed n times
    carries per-observation Fisher information I = E[p(1-p)] about the
    log-odds (treating all other effects as known -- optimistic, so
    this is still a ceiling).  The posterior mean is
        w_hat = lam * w_mle,   lam = n / (n + kappa),
        kappa = 1 / (I * sigma_w^2),
    and w_mle = w_true + e with Var(e) = 1/(n*I); hence
        w_hat = lam * w_true + xi,  Var(xi) = lam*(1-lam)*sigma_w^2.
  * pairwise latents lat ~ N(0, sigma_l^2) per coordinate: info per
    occurrence in a paired slot = I * E[lat_partner^2] = I * sigma_l^2
    (partner treated as known -- again optimistic).
  * the dense beta has ~R observations -> known exactly.

Two numbers are reported per corpus:
  - oracle_mean_auc:  score with lam*w only (no estimation noise) --
    an upper bound even the ideal learner cannot reach;
  - oracle_auc:       score with the posterior-mean including its
    irreducible estimation noise -- the honest achievable ceiling.

usage: python tools_dev/posterior_oracle.py <data_dir>
The corpus generator params (seed/scales) are read from meta.json when
present (v2 corpora) and default to the round-2 values otherwise.
"""
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from paddlerec_tpu.core.metrics import auc_from_buckets  # noqa: E402
from paddlerec_tpu.data.binary import SlotBinFile  # noqa: E402

S, D = 26, 13
PAIR_SLOTS = [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11)]


def expected_count(i, vocab, rows_per_slot):
    """E[count of id i per slot] under the u^3 skew: P(i)=((i+1)^(1/3)-i^(1/3))/V^(1/3)."""
    i = np.asarray(i, np.float64)
    p = ((i + 1.0) ** (1 / 3) - i ** (1 / 3)) / float(vocab) ** (1 / 3)
    return rows_per_slot * p


def planted_truth(meta):
    """Re-derive the planted effects exactly as the generator drew them."""
    seed = int(meta.get("seed", 2023))
    V = int(meta["vocab"])
    rng = np.random.RandomState(seed)
    w = (rng.randn(S, V) * 0.25).astype(np.float32)
    lat = (rng.randn(V, 4) * 0.35).astype(np.float32)
    beta = (rng.randn(D) * 0.3).astype(np.float32)
    bias = float(meta.get("bias", -1.1))
    if meta.get("generator") == "v2":
        # v2 scales effects by the per-id frequency weight (see
        # gen_criteo_scale.py --freq_weight); reproduce that here.
        n_bar = expected_count(np.arange(V), V, meta["rows"])
        kw = float(meta["freq_kappa_w"])
        kl = float(meta["freq_kappa_lat"])
        w *= np.sqrt(n_bar / (n_bar + kw)).astype(np.float32)[None, :] * float(
            meta["sigma_scale_w"])
        lat *= np.sqrt((12 * n_bar) / (12 * n_bar + kl)).astype(
            np.float32)[:, None] * float(meta["sigma_scale_lat"])
    return w, lat, beta, bias


def main_v3(data: str, meta: dict):
    """v3 corpora: slot-unique feasigns, effects in feasign space
    (tools_dev/synth_model.py) — the oracle here IS achievable by a
    feasign-indexed table model."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import synth_model as sm

    w, lat, beta, bias = sm.planted_effects(meta)
    pair_mode = meta.get("pair_mode", "six")
    M = sm.pair_matrix(meta) if pair_mode == "cross" else None
    n_fs = len(w)
    counts = np.zeros(n_fs, np.int64)
    for p in sorted(glob.glob(f"{data}/train/*.bin")):
        f = SlotBinFile(p)
        fs = np.asarray(f.sparse)[:, :, 0].reshape(-1)
        counts += np.bincount(fs, minlength=n_fs)[:n_fs]
    print("train counts done", flush=True)

    test_parts = sorted(glob.glob(f"{data}/test/*.bin"))
    info_num, info_den = 0.0, 0
    for p in test_parts[:2]:
        f = SlotBinFile(p)
        fs = np.asarray(f.sparse)[:, :, 0]
        s_ = sm.score(fs, np.asarray(f.dense), w, lat, beta, bias,
                      pair_mode, M=M)
        pr = 1 / (1 + np.exp(-s_))
        info_num += float((pr * (1 - pr)).sum())
        info_den += len(pr)
    info = info_num / info_den
    print(f"fisher info/obs = {info:.4f}", flush=True)

    w_mean, lat_mean, w_post, lat_post = sm.posterior_effects(
        w, lat, counts, info,
        # fm and cross have identical per-occurrence latent precision
        # (see synth_model.pair_matrix): S-1 partners per occurrence
        lat_obs_mult=(sm.S - 1.0) if pair_mode in ("fm", "cross") else 1.0,
    )
    buckets = 1 << 12
    scorers = {
        "bayes": (w, lat),
        "oracle_mean": (w_mean, lat_mean),
        "oracle": (w_post, lat_post),
        "lr_ceiling": (w_post, np.zeros_like(lat_post)),
    }
    acc = {k: (np.zeros(buckets), np.zeros(buckets)) for k in scorers}
    for p in test_parts:
        f = SlotBinFile(p)
        fs = np.asarray(f.sparse)[:, :, 0]
        dense = np.asarray(f.dense)
        y = np.asarray(f.labels)
        for k, (wk, lk) in scorers.items():
            s_ = sm.score(fs, dense, wk, lk, beta, bias, pair_mode,
                          M=M)
            pr = 1 / (1 + np.exp(-s_))
            b_ = np.clip((pr * buckets).astype(np.int64), 0, buckets - 1)
            pos, neg = acc[k]
            pos += np.bincount(b_, weights=y, minlength=buckets)
            neg += np.bincount(b_, weights=1 - y, minlength=buckets)
    out = {k: round(float(auc_from_buckets(*acc[k])), 5) for k in acc}
    out["fisher_info"] = round(info, 4)
    print("ORACLE " + json.dumps(out), flush=True)


def main():
    data = sys.argv[1] if len(sys.argv) > 1 else "/root/criteo_scale"
    meta = json.load(open(f"{data}/meta.json"))
    if meta.get("generator") in ("v3", "v4", "v5"):
        return main_v3(data, meta)
    V = int(meta["vocab"])
    w, lat, beta, bias = planted_truth(meta)

    # --- pass 1: per-(slot,id) train counts + mean p(1-p) info weight ---
    counts = np.zeros((S, V), np.int64)
    for p in sorted(glob.glob(f"{data}/train/*.bin")):
        f = SlotBinFile(p)
        ids = np.asarray(f.sparse)[:, :, 0]
        for s in range(S):
            np.add.at(counts[s], ids[:, s], 1)
    print("train counts done", flush=True)

    # Fisher info per observation: average p(1-p) computed from the
    # planted model on the test split (same law as train).
    info_num = 0.0
    info_den = 0
    test_parts = sorted(glob.glob(f"{data}/test/*.bin"))
    for p in test_parts[:2]:
        f = SlotBinFile(p)
        ids = np.asarray(f.sparse)[:, :, 0]
        dense = np.asarray(f.dense)
        s_ = w[np.arange(S)[None, :], ids].sum(1)
        for a, b in PAIR_SLOTS:
            s_ += (lat[ids[:, a]] * lat[ids[:, b]]).sum(1)
        s_ += dense @ beta + bias
        pr = 1 / (1 + np.exp(-s_))
        info_num += float((pr * (1 - pr)).sum())
        info_den += len(pr)
    I = info_num / info_den
    print(f"fisher info/obs = {I:.4f}", flush=True)

    # --- shrinkage factors ---
    var_w = (w.astype(np.float64) ** 2)  # per-(slot,id) prior variance
    # avoid 0/0 for exactly-zero effects
    kap_w = np.where(var_w > 0, 1.0 / (I * np.maximum(var_w, 1e-12)), np.inf)
    lam_w = counts / (counts + kap_w)
    var_l = (lat.astype(np.float64) ** 2).mean(1, keepdims=True)  # per-id
    n_lat = np.zeros(V, np.int64)
    for a, b in PAIR_SLOTS:
        n_lat += counts[a] + counts[b]
    # info per paired occurrence about one latent coord = I * E[partner^2]
    mean_var_l = float((lat.astype(np.float64) ** 2).mean())
    kap_l = np.where(var_l > 0, 1.0 / (I * mean_var_l * np.maximum(var_l, 1e-12)),
                     np.inf)
    lam_l = (n_lat[:, None] / (n_lat[:, None] + kap_l))

    rng = np.random.RandomState(7)
    noise_w = rng.randn(S, V) * np.sqrt(lam_w * (1 - lam_w) * var_w)
    w_mean = (lam_w * w).astype(np.float32)
    w_post = (lam_w * w + noise_w).astype(np.float32)
    noise_l = rng.randn(V, 4) * np.sqrt(lam_l * (1 - lam_l) * var_l)
    lat_mean = (lam_l * lat).astype(np.float32)
    lat_post = (lam_l * lat + noise_l).astype(np.float32)

    # --- pass 2: score the test split with each scorer ---
    buckets = 1 << 12
    acc = {k: (np.zeros(buckets), np.zeros(buckets))
           for k in ("bayes", "oracle_mean", "oracle")}
    scorers = {"bayes": (w, lat), "oracle_mean": (w_mean, lat_mean),
               "oracle": (w_post, lat_post)}
    for p in test_parts:
        f = SlotBinFile(p)
        ids = np.asarray(f.sparse)[:, :, 0]
        dense = np.asarray(f.dense)
        y = np.asarray(f.labels)
        base = dense @ beta + bias
        for k, (wk, lk) in scorers.items():
            s_ = wk[np.arange(S)[None, :], ids].sum(1) + base
            for a, b in PAIR_SLOTS:
                s_ += (lk[ids[:, a]] * lk[ids[:, b]]).sum(1)
            pr = 1 / (1 + np.exp(-s_))
            b_ = np.clip((pr * buckets).astype(np.int64), 0, buckets - 1)
            pos, neg = acc[k]
            pos += np.bincount(b_, weights=y, minlength=buckets)
            neg += np.bincount(b_, weights=1 - y, minlength=buckets)
    out = {k: round(float(auc_from_buckets(*acc[k])), 5) for k in acc}
    out["fisher_info"] = round(I, 4)
    out["kappa_w_at_prior_scale"] = round(1.0 / (I * 0.25 ** 2), 1)
    print("ORACLE " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
