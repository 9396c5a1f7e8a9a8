"""Generate a full-Criteo-scale synthetic dataset with a planted
ground-truth CTR model (VERDICT r1 item 4: quality evidence at scale;
real Criteo is unreachable from this egress-less environment — see
datasets/criteo/run.sh for the real-data path).

Design (so learned AUC is meaningful):
  * ids per slot are SKEWED (density ~ x^(-2/3) via u^3 inverse-CDF) —
    hot ids dominate like real feasign traffic;
  * label ~ Bernoulli(sigmoid(s)), s = sum of per-(slot,id) scalar
    effects + low-rank pairwise interactions between 6 slot pairs
    (per-id 4-d latents) + a linear dense term + bias.  The pairwise
    terms exist so interaction models (DeepFM/DCN) can beat LR;
  * the generator's true probabilities give the Bayes-optimal AUC on
    the test split — the ceiling any model can reach.

Writes slotbin shards + meta.json (incl. bayes_auc) under --out.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from paddlerec_tpu.data.binary import write_slotbin  # noqa: E402

S, D = 26, 13


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", type=int, default=45_800_000)
    ap.add_argument("--test_rows", type=int, default=4_580_000)
    ap.add_argument("--vocab", type=int, default=1_000_001)
    ap.add_argument("--chunk", type=int, default=1_000_000)
    ap.add_argument("--seed", type=int, default=2023)
    # v2 (VERDICT r2 item 1b): frequency-weighted effect scales.  The
    # round-2 corpus planted iid effects over ALL ids, so most signal
    # sat in tail ids no estimator can learn from a handful of draws —
    # its "ceiling" was unreachable and the model-vs-ceiling gap
    # uninterpretable.  v2 scales each id's effect by
    # sqrt(n_bar/(n_bar+kappa)) (n_bar = expected train count), exactly
    # the posterior-shrinkage shape, so planted signal decays where
    # estimation becomes impossible; scales calibrated by
    # tools_dev/calibrate_gen.py so the estimation-aware ceiling
    # (posterior_oracle.py) lands Criteo-like (~0.80).
    ap.add_argument("--freq_weight", action="store_true")
    # v3 (round-3 finding): slot-UNIQUE feasigns — each slot draws
    # skewed local ids from its own disjoint range, all effects live in
    # feasign space (tools_dev/synth_model.py).  v1/v2 let one feasign
    # be hot in all 26 slots with 26 different effects, which no
    # feasign-indexed table can represent; real Criteo's hashed buckets
    # are effectively slot-unique, so v3 is BOTH learnable and realistic.
    ap.add_argument("--v3", action="store_true")
    # v4 = the v3 layout with pair_mode "fm": all slot pairs interact
    # through the shared latent space (see synth_model.score) — the
    # dense low-rank interaction structure real Criteo exhibits, which
    # every interaction model (FM/DeepFM/DCN/DNN) can represent.
    # v5 = the v3 layout with pair_mode "cross": per-pair bilinear maps
    # (the one-cross-layer CrossNetV2 family) — the mirror of v4, used to
    # certify the cross-form model class (synth_model.pair_matrix).
    # Same calibration profile as fm: sigma_M = 1/sqrt(K) makes both the
    # interaction variance and the latent observation precision match.
    ap.add_argument("--pair_mode", choices=["six", "fm", "cross"],
                    default="six")
    # calibrated profiles (tools_dev/calibrate_gen_v3.py).  Defaults
    # resolve PER pair_mode so the documented corpora reproduce from the
    # bare command — the round-3 lesson: the v4 table's parameters lived
    # only in a non-committed meta.json and had to be re-derived by
    # re-running the calibrator grid when the environment was reset.
    #   six (v2/v3): scales 2.5/2.5, kappas 696/2899 (kappa_mult 8.7)
    #   fm   (v4):   scales 0.8/0.7, kappas 240/999.58 (kappa_mult 3)
    #                -> bayes 0.8356, oracle ~0.800, LR ceiling 0.679,
    #                   positive rate 0.321 at 45.8M rows, vocab 10^6
    ap.add_argument("--scale_w", type=float, default=None)
    ap.add_argument("--scale_lat", type=float, default=None)
    ap.add_argument("--kappa_w", type=float, default=None)
    ap.add_argument("--kappa_lat", type=float, default=None)
    args = ap.parse_args()
    cal = ({"scale_w": 0.8, "scale_lat": 0.7,
            "kappa_w": 3 / (0.2 * 0.25 ** 2),
            "kappa_lat": 3 / (0.2 * 0.35 ** 4)}
           if args.pair_mode in ("fm", "cross") else
           {"scale_w": 2.5, "scale_lat": 2.5,
            "kappa_w": 696.0, "kappa_lat": 2899.0})
    for k, v in cal.items():
        if getattr(args, k) is None:
            setattr(args, k, v)
    if args.v3:
        return gen_v3(args)

    rng = np.random.RandomState(args.seed)
    V = args.vocab
    # ground truth: per-(slot,id) scalar effects, sparse-ish latents
    w = (rng.randn(S, V) * 0.25).astype(np.float32)
    pair_slots = [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11)]
    lat = (rng.randn(V, 4) * 0.35).astype(np.float32)
    beta = (rng.randn(D) * 0.3).astype(np.float32)
    bias = -1.1  # ~ 0.25 positive rate like Criteo
    if args.freq_weight:
        i = np.arange(V, dtype=np.float64)
        p_id = ((i + 1.0) ** (1 / 3) - i ** (1 / 3)) / float(V) ** (1 / 3)
        n_bar = args.rows * p_id
        w *= (np.sqrt(n_bar / (n_bar + args.kappa_w)) * args.scale_w
              ).astype(np.float32)[None, :]
        lat *= (np.sqrt(12 * n_bar / (12 * n_bar + args.kappa_lat))
                * args.scale_lat).astype(np.float32)[:, None]

    os.makedirs(f"{args.out}/train", exist_ok=True)
    os.makedirs(f"{args.out}/test", exist_ok=True)

    def gen_split(n_rows, sub, seed0, collect_bayes=False):
        probs_all = []
        labels_all = []
        part = 0
        done = 0
        while done < n_rows:
            n = min(args.chunk, n_rows - done)
            r = np.random.RandomState(seed0 + part)
            u = r.rand(n, S)
            ids = (V * u**3).astype(np.int64) % V  # skewed
            dense = r.rand(n, D).astype(np.float32)
            s = w[np.arange(S)[None, :], ids].sum(1)
            for a, b in pair_slots:
                s += (lat[ids[:, a]] * lat[ids[:, b]]).sum(1)
            s += dense @ beta + bias
            p = 1.0 / (1.0 + np.exp(-s))
            labels = (r.rand(n) < p).astype(np.float32)
            write_slotbin(
                f"{args.out}/{sub}/part-{part:03d}.bin",
                labels, ids.astype(np.int32), dense,
            )
            if collect_bayes:
                probs_all.append(p.astype(np.float32))
                labels_all.append(labels)
            done += n
            part += 1
            if part % 10 == 0:
                print(f"{sub}: {done}/{n_rows}", flush=True)
        return (
            (np.concatenate(probs_all), np.concatenate(labels_all))
            if collect_bayes else (None, None)
        )

    gen_split(args.rows, "train", args.seed * 7 + 1)
    p, y = gen_split(args.test_rows, "test", args.seed * 13 + 5,
                     collect_bayes=True)
    # Bayes AUC of the true probabilities on the test labels
    from paddlerec_tpu.core.metrics import auc_from_buckets

    buckets = 1 << 12
    b = np.clip((p * buckets).astype(np.int64), 0, buckets - 1)
    pos = np.bincount(b, weights=y, minlength=buckets)
    neg = np.bincount(b, weights=1 - y, minlength=buckets)
    bayes = auc_from_buckets(pos, neg)
    meta = {
        "rows": args.rows, "test_rows": args.test_rows, "vocab": V,
        "seed": args.seed, "bias": bias,
        "bayes_auc": round(float(bayes), 5),
        "positive_rate": round(float(y.mean()), 5),
    }
    if args.freq_weight:
        meta.update({
            "generator": "v2",
            "freq_kappa_w": args.kappa_w,
            "freq_kappa_lat": args.kappa_lat,
            "sigma_scale_w": args.scale_w,
            "sigma_scale_lat": args.scale_lat,
        })
    with open(f"{args.out}/meta.json", "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


def gen_v3(args):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import synth_model as sm

    from paddlerec_tpu.core.metrics import auc_from_buckets

    V = args.vocab
    meta = {
        "rows": args.rows, "test_rows": args.test_rows, "vocab": V,
        "seed": args.seed, "bias": -1.1,
        "generator": {"fm": "v4", "cross": "v5"}.get(args.pair_mode, "v3"),
        "pair_mode": args.pair_mode,
        "freq_kappa_w": args.kappa_w, "freq_kappa_lat": args.kappa_lat,
        "sigma_scale_w": args.scale_w, "sigma_scale_lat": args.scale_lat,
    }
    w, lat, beta, bias = sm.planted_effects(meta)
    M = sm.pair_matrix(meta) if args.pair_mode == "cross" else None
    os.makedirs(f"{args.out}/train", exist_ok=True)
    os.makedirs(f"{args.out}/test", exist_ok=True)

    def gen_split(n_rows, sub, seed0, collect_bayes=False):
        probs_all, labels_all = [], []
        part, done = 0, 0
        while done < n_rows:
            n = min(args.chunk, n_rows - done)
            r = np.random.RandomState(seed0 + part)
            fs, dense = sm.draw_rows(r, n, V)
            s = sm.score(fs, dense, w, lat, beta, bias, args.pair_mode,
                         M=M)
            p = 1.0 / (1.0 + np.exp(-s))
            labels = (r.rand(n) < p).astype(np.float32)
            write_slotbin(
                f"{args.out}/{sub}/part-{part:03d}.bin",
                labels, fs.astype(np.int32), dense,
            )
            if collect_bayes:
                probs_all.append(p.astype(np.float32))
                labels_all.append(labels)
            done += n
            part += 1
            if part % 10 == 0:
                print(f"{sub}: {done}/{n_rows}", flush=True)
        return ((np.concatenate(probs_all), np.concatenate(labels_all))
                if collect_bayes else (None, None))

    gen_split(args.rows, "train", args.seed * 7 + 1)
    p, y = gen_split(args.test_rows, "test", args.seed * 13 + 5,
                     collect_bayes=True)
    buckets = 1 << 12
    b = np.clip((p * buckets).astype(np.int64), 0, buckets - 1)
    pos = np.bincount(b, weights=y, minlength=buckets)
    neg = np.bincount(b, weights=1 - y, minlength=buckets)
    meta["bayes_auc"] = round(float(auc_from_buckets(pos, neg)), 5)
    meta["positive_rate"] = round(float(y.mean()), 5)
    with open(f"{args.out}/meta.json", "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
