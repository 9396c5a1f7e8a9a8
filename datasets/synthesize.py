"""Offline synthetic generators for every cataloged dataset.

usage: python -m datasets.synthesize <criteo|census|aliccp|omniglot> <out_dir>
"""
import sys

import numpy as np


def criteo(out):
    from paddlerec_tpu.data.synthetic import write_criteo_sample

    write_criteo_sample(out, num_lines=10000, num_files=4, vocab=1000001)


def census(out, feature_size=499):
    import os

    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(0)
    with open(f"{out}/part-0", "w") as f:
        for _ in range(5000):
            vals = [str(rng.randint(0, 2)), str(rng.randint(0, 2))] + [
                f"{v:.4f}" for v in rng.rand(feature_size)
            ]
            f.write(",".join(vals) + "\n")


def aliccp(out):
    import os

    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(0)
    with open(f"{out}/part-0", "w") as f:
        for i in range(5000):
            click = int(rng.rand() < 0.5)
            conv = int(click and rng.rand() < 0.4)
            toks = [f"101:{rng.randint(1,737946)}", f"205:{rng.randint(1,737946)}",
                    f"301:{rng.randint(1,737946)}"]
            f.write(f"{i},{click},{conv},idx,{','.join(toks)}\n")


def omniglot(out):
    import os

    rng = np.random.RandomState(0)
    for c in range(20):
        d = f"{out}/alphabet/char{c}"
        os.makedirs(d, exist_ok=True)
        proto = rng.rand(28, 28)
        for i in range(20):
            np.save(f"{d}/{i}.npy",
                    np.clip(proto + rng.randn(28, 28) * 0.05, 0, 1
                            ).astype(np.float32))


def din_sequences(out, n=4000, items=63001, cats=801, seq=50):
    """Amazon-format lines hist_items;hist_cats;item;cat;label
    (amazonElec_Din / Beauty / Taobao family)."""
    import os

    os.makedirs(f"{out}/train", exist_ok=True)
    rng = np.random.RandomState(0)
    with open(f"{out}/train/part-0", "w") as f:
        for _ in range(n):
            l = rng.randint(1, seq)
            hi = rng.randint(1, items, l)
            hc = rng.randint(1, cats, l)
            f.write(";".join([
                " ".join(map(str, hi)), " ".join(map(str, hc)),
                str(rng.randint(1, items)), str(rng.randint(1, cats)),
                str(rng.randint(0, 2)),
            ]) + "\n")


def bq_pairs(out, n=2000, trigram_d=2900, neg=4):
    """BQ trigram-vector tsv for dssm/simnet."""
    import os

    os.makedirs(f"{out}/train", exist_ok=True)
    rng = np.random.RandomState(0)

    def vec():
        idx = rng.choice(trigram_d, 6, replace=False)
        v = np.zeros(trigram_d, np.int8)
        v[idx] = 1
        return ",".join(map(str, np.nonzero(v)[0]))

    with open(f"{out}/train/part-0", "w") as f:
        for _ in range(n):
            cols = [vec() for _ in range(2 + neg)]
            f.write("\t".join(cols) + "\n")


def tag_text(out, n=4000, vocab_text=75378, vocab_tag=4):
    """tagspace/ag_news: text tokens \t tag."""
    import os

    os.makedirs(f"{out}/train", exist_ok=True)
    rng = np.random.RandomState(0)
    with open(f"{out}/train/part-0", "w") as f:
        for _ in range(n):
            toks = rng.randint(1, vocab_text, rng.randint(3, 20))
            f.write(" ".join(map(str, toks)) +
                    f"\t{rng.randint(0, vocab_tag)}\n")


def word2vec_text(out, n=20000, vocab=10000):
    import os

    os.makedirs(f"{out}/train", exist_ok=True)
    rng = np.random.RandomState(0)
    with open(f"{out}/train/part-0", "w") as f:
        for _ in range(n // 20):
            f.write(" ".join(str(rng.randint(1, vocab))
                             for _ in range(20)) + "\n")


def mind_book(out, n=4000, items=367983, seq=20):
    """AmazonBook mind format: hist ids, target (per our mind reader)."""
    import os

    os.makedirs(f"{out}/train", exist_ok=True)
    rng = np.random.RandomState(0)
    with open(f"{out}/train/part-0", "w") as f:
        for u in range(n):
            l = rng.randint(2, seq)
            hist = rng.randint(1, items, l)
            f.write(f"{u} " + " ".join(map(str, hist)) + "\n")


def letor(out, n=1000, d=10):
    import os

    os.makedirs(f"{out}/train", exist_ok=True)
    rng = np.random.RandomState(0)
    with open(f"{out}/train/part-0", "w") as f:
        for q in range(n):
            f.write(f"{rng.randint(0,2)} qid:{q} " + " ".join(
                f"{i+1}:{rng.rand():.4f}" for i in range(d)) + "\n")


def multimnist(out, n=2000):
    import os
    import pickle

    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (n, 1296), dtype=np.uint8)
    y = rng.randint(0, 10, (n, 2))
    with open(f"{out}/multi_mnist.pkl", "wb") as f:
        pickle.dump((x, y), f)


# dataset name → (generator, kwargs); criteo-slot covers every
# criteo-schema variant the rank configs consume
_CRITEO_FAMILY = [
    "criteo", "criteo_lr", "criteo_autoint", "criteo_dcn_v2",
    "criteo_fgcnn", "criteo_autofis", "Avazu", "Avazu_flen",
    "KDD2012_track2", "sign", "slot_dnn",
]
GENERATORS = {
    **{k: ("criteo", criteo) for k in _CRITEO_FAMILY},
    "census": ("census", census),
    "Adult": ("census", census),
    "ali-ccp": ("aliccp", aliccp),
    "ali-cpp_aitm": ("aliccp", aliccp),
    "omniglot": ("omniglot", omniglot),
    "amazonElec_Din": ("din", din_sequences),
    "Beauty": ("din", din_sequences),
    "Taobao": ("din", din_sequences),
    "Ali_Display_Ad_Click": ("din", din_sequences),
    "Ali_Display_Ad_Click_DSIN": ("din", din_sequences),
    "BQ_dssm": ("bq", bq_pairs),
    "BQ_simnet": ("bq", bq_pairs),
    "ag_news": ("tag", tag_text),
    "senti_clas": ("tag", tag_text),
    "one_billion": ("w2v", word2vec_text),
    "AmazonBook": ("mind", mind_book),
    "letor07": ("letor", letor),
    "Multi_MNIST_DselectK": ("multimnist", multimnist),
}


def synthesize_dataset(name: str, out: str) -> int:
    """fetch.py --synth entry: schema-correct synthetic data for the
    known families; unknown datasets get a pointer instead of garbage."""
    entry = GENERATORS.get(name)
    if entry is None:
        print(
            f"no synthetic generator for {name!r}; supported: "
            + ", ".join(sorted(GENERATORS))
        )
        return 1
    _, fn = entry
    fn(out)
    print(f"synthetic {name} written under {out}")
    return 0


if __name__ == "__main__":
    which, out = sys.argv[1], sys.argv[2]
    fns = {"criteo": criteo, "census": census, "aliccp": aliccp,
           "omniglot": omniglot}
    if which in fns:
        fns[which](out)
    else:
        sys.exit(synthesize_dataset(which, out))
    print(f"synthesized {which} -> {out}")
