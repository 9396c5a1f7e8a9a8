"""Synthetic word2vec corpus with PLANTED analogy structure and a known
achievable ceiling (VERDICT r3 item 5).

Generative model (the RAND-WALK log-linear family — the class for which
skip-gram provably recovers word vectors and linear analogies hold):

  * vocab = B bases x A attrs; true vector v_w = u_base + r_attr
    (random gaussian bases/offsets in d_true dims);
  * per-word frequency bias beta_w: zipfian over bases AND attrs, so
    the corpus has the skewed unigram distribution that makes
    frequency-weighted negative sampling matter;
  * each sentence draws a context c ~ N(0, sigma^2 I) and emits tokens
    iid from softmax(v_w . c + beta_w).

Analogy questions are (b1,a1):(b1,a2) :: (b2,a1):(b2,a2) — the planted
structure makes emb_b - emb_a + emb_c = u_b2 + r_a2 exactly in the true
space, so the TRUE vectors' analogy accuracy is the corpus ceiling
(reported in meta.json as ceiling_acc).

Writes: train/part-*.txt (token-id lines), word_count.txt (the
reference's ``id count`` dict format), questions.txt (a b c d ids),
meta.json.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--bases", type=int, default=40)
    ap.add_argument("--attrs", type=int, default=25)
    ap.add_argument("--d_true", type=int, default=16)
    ap.add_argument("--sentences", type=int, default=30000)
    ap.add_argument("--sent_len", type=int, default=20)
    ap.add_argument("--ctx_sigma", type=float, default=0.45)
    ap.add_argument("--zipf_base", type=float, default=1.0)
    ap.add_argument("--zipf_attr", type=float, default=1.0)
    ap.add_argument("--questions", type=int, default=2000)
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()
    rng = np.random.RandomState(args.seed)

    B, A, d = args.bases, args.attrs, args.d_true
    V = B * A
    u = rng.randn(B, d) / np.sqrt(d)
    r = rng.randn(A, d) / np.sqrt(d)
    v = (u[:, None, :] + r[None, :, :]).reshape(V, d)  # word id = b*A + a
    beta = (-args.zipf_base * np.log(1 + np.arange(B)))[:, None] \
        + (-args.zipf_attr * np.log(1 + np.arange(A)))[None, :]
    beta = beta.reshape(V)

    os.makedirs(f"{args.out}/train", exist_ok=True)
    counts = np.zeros(V, np.int64)
    per_file = (args.sentences + args.files - 1) // args.files
    written = 0
    for fi in range(args.files):
        n = min(per_file, args.sentences - written)
        if n <= 0:
            break
        # all sentences of this file in one vectorized block
        c = rng.randn(n, d) * args.ctx_sigma
        logits = c @ v.T + beta[None, :]  # (n, V)
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        cum = p.cumsum(axis=1)
        draws = rng.rand(n, args.sent_len)
        toks = np.stack([
            np.searchsorted(cum[i], draws[i]) for i in range(n)
        ]).clip(0, V - 1)
        counts += np.bincount(toks.reshape(-1), minlength=V)
        with open(f"{args.out}/train/part-{fi}.txt", "w") as f:
            for row in toks:
                f.write(" ".join(map(str, row)) + "\n")
        written += n

    with open(f"{args.out}/word_count.txt", "w") as f:
        for i, cn in enumerate(counts):
            f.write(f"{i} {int(cn)}\n")

    # analogy questions over distinct base/attr pairs
    qs = []
    while len(qs) < args.questions:
        b1, b2 = rng.randint(0, B, 2)
        a1, a2 = rng.randint(0, A, 2)
        if b1 == b2 or a1 == a2:
            continue
        qs.append([b1 * A + a1, b1 * A + a2, b2 * A + a1, b2 * A + a2])
    qs = np.asarray(qs, np.int64)
    with open(f"{args.out}/questions.txt", "w") as f:
        for row in qs:
            f.write(" ".join(map(str, row)) + "\n")

    from paddlerec_tpu.tools.analogy_eval import analogy_accuracy

    ceiling = analogy_accuracy(v, qs)
    meta = {
        "vocab": V, "bases": B, "attrs": A, "d_true": d,
        "tokens": int(args.sentences * args.sent_len),
        "seed": args.seed, "ceiling_acc": round(float(ceiling), 5),
        "top_word_freq": round(float(counts.max() / counts.sum()), 5),
        "median_count": int(np.median(counts)),
    }
    with open(f"{args.out}/meta.json", "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
