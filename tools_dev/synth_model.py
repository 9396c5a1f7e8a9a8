"""The v3 synthetic-Criteo generative model, shared by the generator,
the calibration simulator, and the posterior-oracle scorer.

Why v3 (the round-3 finding): v1/v2 drew every slot's ids from the SAME
[0,V) space with per-(slot,id) effects — one feasign was hot in all 26
slots carrying 26 DIFFERENT planted effects, which a feasign-indexed
embedding row (dim 9) cannot represent.  The oracle (which knows the
(slot,id) pair) was therefore unreachable by ANY table model: measured
on v2, LR scored 0.573 against its 0.75 additive ceiling and no
lr/epoch/dtype change moved deepfm past 0.66 vs the 0.813 oracle.

Real Criteo does not have that pathology: raw categorical values are
column-specific strings, so hot hash buckets are effectively
slot-unique.  v3 reproduces it exactly: slot s draws skewed LOCAL ids
from its own disjoint range, feasign = s*V26 + local, and all planted
effects (scalar w, pairwise latents) live in FEASIGN space — one owner
slot per feasign, so a 9-dim row has to encode only (1 scalar + 4-dim
latent), and the posterior-mean oracle is a ceiling a real model can
approach.

Frequency weighting (kept from v2): effect scales shrink as
sqrt(n_bar/(n_bar+kappa)) with n_bar the EXPECTED train count, so
planted signal decays exactly where estimation becomes impossible.
"""

from __future__ import annotations

import numpy as np

S, D = 26, 13
PAIR_SLOTS = [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11)]


def slot_vocab(vocab: int) -> int:
    return vocab // S  # per-slot local-id range (V26)


def expected_counts(vocab: int, rows: int) -> np.ndarray:
    """E[train count] of every feasign (one owner slot each) under the
    u^3 skew on the local range."""
    v26 = slot_vocab(vocab)
    i = np.arange(v26, dtype=np.float64)
    p = ((i + 1.0) ** (1 / 3) - i ** (1 / 3)) / float(v26) ** (1 / 3)
    n_local = rows * p  # same for every slot
    return np.tile(n_local, S)[: S * v26]


def planted_effects(meta: dict):
    """(w, lat, beta, bias) exactly as the v3 generator draws them."""
    vocab = int(meta["vocab"])
    v26 = slot_vocab(vocab)
    n_fs = S * v26
    rng = np.random.RandomState(int(meta.get("seed", 2023)))
    w = (rng.randn(n_fs) * 0.25).astype(np.float32)
    lat = (rng.randn(n_fs, 4) * 0.35).astype(np.float32)
    beta = (rng.randn(D) * 0.3).astype(np.float32)
    bias = float(meta.get("bias", -1.1))
    n_bar = expected_counts(vocab, int(meta["rows"]))
    kw = float(meta["freq_kappa_w"])
    kl = float(meta["freq_kappa_lat"])
    w *= (np.sqrt(n_bar / (n_bar + kw))
          * float(meta["sigma_scale_w"])).astype(np.float32)
    lat *= (np.sqrt(n_bar / (n_bar + kl))[:, None]
            * float(meta["sigma_scale_lat"])).astype(np.float32)
    return w, lat, beta, bias


def pair_matrix(meta: dict):
    """The v5 ("cross" pair_mode) per-pair bilinear maps M (S, S, K, K),
    upper triangle only (a < b), entries N(0, 1/K).

    sigma_M = 1/sqrt(K) makes both the per-pair interaction variance
    (Var[lat_a^T M lat_b] = K^2 sigma_M^2 sigma^4 = K sigma^4) and the
    per-occurrence latent observation precision (Var of the regressor
    sum_b M_ab lat_b per coordinate = (S-1) sigma^2) EQUAL to the v4 fm
    mode's — so the committed fm calibration profile and the oracle's
    lat_obs_mult = S-1 carry over unchanged.

    Drawn from seed+1 so w/lat/beta are bit-identical to the fm corpus
    at the same seed."""
    K = 4
    rng = np.random.RandomState(int(meta.get("seed", 2023)) + 1)
    m = (rng.randn(S, S, K, K) / np.sqrt(K)).astype(np.float32)
    iu = np.triu(np.ones((S, S), bool), 1)
    return m * iu[:, :, None, None]


def draw_rows(rng: np.random.RandomState, n: int, vocab: int):
    """(feasigns (n,S) int, dense (n,D) f32) under the v3 layout."""
    v26 = slot_vocab(vocab)
    u = rng.rand(n, S)
    local = (v26 * u ** 3).astype(np.int64) % v26
    fs = local + (np.arange(S, dtype=np.int64) * v26)[None, :]
    dense = rng.rand(n, D).astype(np.float32)
    return fs, dense


def score(fs: np.ndarray, dense: np.ndarray, w, lat, beta, bias,
          pair_mode: str = "six", M=None):
    """pair_mode "six" (v3): six fixed slot pairs interact, others are
    additive-only.  pair_mode "fm" (v4): ALL slot pairs interact through
    the shared latent space — sum_{a<b} <lat_a, lat_b>, i.e. exactly the
    FM inductive bias.  v4 exists because the v3 structure (6 strong
    pair-specific couplings, 319 zero pairs) is statistically adversarial
    to generic interaction models: they must DISCOVER the sparse pair
    support from data, an estimation cost the matched-form probe does
    not pay, so no generic model could close the gap to the realizable
    ceiling.  Real Criteo behaves like "fm": FM/DeepFM/DCN all land
    within ~0.02 of each other (models/rank/readme.md), evidence that
    its interactions are dense and low-rank — the form every
    interaction model can represent.

    pair_mode "cross" (v5): per-pair DIFFERENT bilinear maps,
    sum_{a<b} lat_a^T M_ab lat_b (M from pair_matrix).  This is the
    one-cross-layer CrossNetV2 family (x0 (+) x0 . W x0 over the concat
    of slot latents, models/rank/dcn_v2/net.py:214-226 in the
    reference): representable by slot-position-aware quadratic models
    (dcn_v2's cross weights are slot-pair specific) but NOT by FM's
    shared dot product, which forces M_ab = I — the mirror image of the
    fm corpus, built to measure the architecture-mismatch cost in the
    other direction."""
    s = w[fs].sum(1)
    if pair_mode == "fm":
        g = lat[fs]  # (n, S, 4)
        tot = g.sum(axis=1)
        s += 0.5 * ((tot * tot).sum(axis=1) - (g * g).sum(axis=(1, 2)))
    elif pair_mode == "cross":
        g = lat[fs]  # (n, S, K)
        k = lat.shape[1]
        g2 = g.reshape(len(g), S * k)
        # M is upper-triangular in (a, b), so the quadratic form g2 W g2
        # counts each pair exactly once
        m2 = M.transpose(0, 2, 1, 3).reshape(S * k, S * k)
        s += ((g2 @ m2) * g2).sum(1)
    else:
        for a, b in PAIR_SLOTS:
            s += (lat[fs[:, a]] * lat[fs[:, b]]).sum(1)
    return s + dense @ beta + bias


def posterior_effects(w, lat, counts, info, rng_seed=7, lat_obs_mult=1.0):
    """The ideal Bayesian learner's (posterior-mean) effects given the
    realized per-feasign train counts and per-observation Fisher info.

    Returns (w_mean, lat_mean, w_post, lat_post): the noise-free
    shrunken means (an unreachable upper bound) and the posterior means
    including irreducible estimation noise (the honest ceiling).

    lat_obs_mult: observation-precision multiplier for the latents.  In
    "six" mode a paired feasign's latent is observed through ONE partner
    per occurrence (mult 1).  In "fm" mode every occurrence observes
    <lat_f, sum of S-1 partner latents> — the regressor's variance is
    (S-1)x a single partner's, so per-occurrence precision scales by
    S-1 = 25.
    """
    rng = np.random.RandomState(rng_seed)
    var_w = w.astype(np.float64) ** 2
    kap_w = np.where(var_w > 0, 1.0 / (info * np.maximum(var_w, 1e-12)),
                     np.inf)
    lam_w = counts / (counts + kap_w)
    w_mean = (lam_w * w).astype(np.float32)
    w_post = (w_mean + rng.randn(*w.shape)
              * np.sqrt(lam_w * (1 - lam_w) * var_w)).astype(np.float32)
    var_l = (lat.astype(np.float64) ** 2).mean(1, keepdims=True)
    mean_var_l = float((lat.astype(np.float64) ** 2).mean())
    kap_l = np.where(var_l > 0,
                     1.0 / (info * lat_obs_mult * mean_var_l
                            * np.maximum(var_l, 1e-12)),
                     np.inf)
    lam_l = counts[:, None] / (counts[:, None] + kap_l)
    lat_mean = (lam_l * lat).astype(np.float32)
    lat_post = (lat_mean + rng.randn(*lat.shape)
                * np.sqrt(lam_l * (1 - lam_l) * var_l)).astype(np.float32)
    return w_mean, lat_mean, w_post, lat_post
