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


if __name__ == "__main__":
    which, out = sys.argv[1], sys.argv[2]
    {"criteo": criteo, "census": census, "aliccp": aliccp,
     "omniglot": omniglot}[which](out)
    print(f"synthesized {which} -> {out}")
