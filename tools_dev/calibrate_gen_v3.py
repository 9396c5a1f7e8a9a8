"""Calibrate the v3 (slot-unique feasign) generator: pick effect scales
and frequency kappas so the achievable posterior-oracle AUC is
Criteo-like (~0.80) with the LR (additive-only) ceiling clearly below.

usage: python tools_dev/calibrate_gen_v3.py [sim_rows] [train_rows]
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools_dev")
from paddlerec_tpu.core.metrics import auc_from_buckets  # noqa: E402
import synth_model as sm  # noqa: E402


def bucket_auc(score, y, buckets=1 << 12):
    pr = 1 / (1 + np.exp(-score))
    b = np.clip((pr * buckets).astype(np.int64), 0, buckets - 1)
    pos = np.bincount(b, weights=y, minlength=buckets)
    neg = np.bincount(b, weights=1 - y, minlength=buckets)
    return float(auc_from_buckets(pos, neg))


def run(scale_w, scale_l, km, sim_rows, train_rows, vocab=1_000_001,
        seed=2023, pair_mode="six"):
    kw0 = 1.0 / (0.2 * 0.25 ** 2)
    kl0 = 1.0 / (0.2 * 0.35 ** 2 * 0.35 ** 2)
    meta = {"vocab": vocab, "rows": train_rows, "seed": seed,
            "freq_kappa_w": kw0 * km, "freq_kappa_lat": kl0 * km,
            "sigma_scale_w": scale_w, "sigma_scale_lat": scale_l}
    w, lat, beta, bias = sm.planted_effects(meta)
    rng = np.random.RandomState(seed + 99)
    fs, dense = sm.draw_rows(rng, sim_rows, vocab)
    s_bayes = sm.score(fs, dense, w, lat, beta, bias, pair_mode)
    p = 1 / (1 + np.exp(-s_bayes))
    y = (rng.rand(sim_rows) < p).astype(np.float64)
    info = float((p * (1 - p)).mean())
    n_bar = sm.expected_counts(vocab, train_rows)
    _wm, _lm, w_post, lat_post = sm.posterior_effects(
        w, lat, n_bar, info,
        lat_obs_mult=(sm.S - 1.0) if pair_mode == "fm" else 1.0)
    s_o = sm.score(fs, dense, w_post, lat_post, beta, bias, pair_mode)
    s_lr = sm.score(fs, dense, w_post, np.zeros_like(lat_post), beta, bias,
                    pair_mode)
    return {
        "scale_w": scale_w, "scale_l": scale_l, "kappa_mult": km,
        "pair_mode": pair_mode, "I": round(info, 4),
        "bayes": round(bucket_auc(s_bayes, y), 4),
        "oracle": round(bucket_auc(s_o, y), 4),
        "lr_ceiling": round(bucket_auc(s_lr, y), 4),
    }


def main():
    sim_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    train_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 45_800_000
    pair_mode = sys.argv[3] if len(sys.argv) > 3 else "six"
    if pair_mode == "fm":
        # ~54x more interacting pairs than "six": per-pair latent scale
        # shrinks ~54^(1/4) to hold the pairwise signal variance
        grid = [
            (0.8, 0.55, 3), (0.8, 0.7, 3), (0.8, 0.85, 3),
            (0.8, 0.7, 1), (0.8, 0.85, 1), (0.8, 1.0, 1),
        ]
    else:
        grid = [
            (1.0, 1.0, 1), (1.5, 1.5, 1), (2.0, 2.0, 1),
            (1.5, 1.5, 3), (2.0, 2.0, 3), (2.5, 2.5, 3),
            (2.0, 2.0, 10), (2.5, 2.5, 10),
        ]
    for scale_w, scale_l, km in grid:
        print(json.dumps(run(scale_w, scale_l, km, sim_rows, train_rows,
                             pair_mode=pair_mode)), flush=True)


if __name__ == "__main__":
    main()
