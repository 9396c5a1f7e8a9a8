"""Generate the tiny TIPC sample datasets (the prepare.sh analog).

usage: python test_tipc/prepare.py [criteo|census|aliccp|all] [out_root]
"""
import os
import sys

import numpy as np


def write_criteo(root):
    from paddlerec_tpu.data.synthetic import write_criteo_sample

    write_criteo_sample(os.path.join(root, "train"), num_lines=256,
                        num_files=2, vocab=10000)


def write_census(root, feature_size=64):
    rng = np.random.RandomState(0)
    out = os.path.join(root, "census")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "part-0"), "w") as f:
        for _ in range(256):
            vals = [str(rng.randint(0, 2)), str(rng.randint(0, 2))] + [
                f"{v:.4f}" for v in rng.rand(feature_size)
            ]
            f.write(",".join(vals) + "\n")


def write_aliccp(root):
    rng = np.random.RandomState(0)
    out = os.path.join(root, "aliccp")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "part-0"), "w") as f:
        for i in range(256):
            click = int(rng.rand() < 0.5)
            conv = int(click and rng.rand() < 0.4)
            toks = [f"101:{rng.randint(1, 9999)}",
                    f"205:{rng.randint(1, 9999)}",
                    f"301:{rng.randint(1, 9999)}"]
            f.write(f"{i},{click},{conv},idx,{','.join(toks)}\n")


def write_dssm(root, trigram_d=128, neg_num=1):
    rng = np.random.RandomState(0)
    out = os.path.join(root, "dssm")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "part-0"), "w") as f:
        for _ in range(128):
            def vec():
                v = (rng.rand(trigram_d) < 0.05).astype(np.float32)
                return ",".join(f"{x:.0f}" for x in v)
            cols = [vec(), vec()] + [vec() for _ in range(neg_num)]
            f.write("\t".join(cols) + "\n")


def write_textcnn(root, dict_dim=1000, max_len=32):
    rng = np.random.RandomState(0)
    out = os.path.join(root, "textcnn")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "part-0"), "w") as f:
        for _ in range(256):
            n = rng.randint(4, max_len + 1)
            toks = rng.randint(1, dict_dim, n)
            label = int(toks.sum() % 2)
            f.write(" ".join(map(str, toks)) + f" {n} {label}\n")


def write_ncf(root, n_users=200, n_items=100):
    rng = np.random.RandomState(0)
    out = os.path.join(root, "ncf")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "part-0"), "w") as f:
        for _ in range(512):
            u, i = rng.randint(n_users), rng.randint(n_items)
            f.write(f"{u},{i},{int(rng.rand() < 0.5)}\n")


def write_sign(root, n_feature=1000, num_nodes=3):
    """Frappe-style instance graphs: ``label feat1 .. featF``."""
    rng = np.random.RandomState(0)
    out = os.path.join(root, "sign")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "part-0"), "w") as f:
        for _ in range(256):
            feats = rng.randint(1, n_feature, num_nodes)
            f.write(f"{int(rng.rand() < 0.5)} " + " ".join(map(str, feats))
                    + "\n")


def write_dpin(root, K=4, L=4, max_item=1000, max_context=1000):
    """``target_item,target_cat;K·L items;K·L cats;K labels``."""
    rng = np.random.RandomState(0)
    out = os.path.join(root, "dpin")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "part-0"), "w") as f:
        for _ in range(256):
            items = ",".join(str(rng.randint(1, max_item))
                             for _ in range(K * L))
            cats = ",".join(str(rng.randint(1, max_context))
                            for _ in range(K * L))
            labels = ",".join(str(int(rng.rand() < 0.5)) for _ in range(K))
            f.write(f"{rng.randint(1, max_item)},"
                    f"{rng.randint(1, max_context)};{items};{cats};{labels}\n")


def write_dsin(root, vocab=100, sess_count=2, sess_max_length=4):
    """``label;15 sparse ids;price;2S·L sess ids;sess_length``."""
    rng = np.random.RandomState(0)
    out = os.path.join(root, "dsin")
    os.makedirs(out, exist_ok=True)
    rows, cols = 2 * sess_count, sess_max_length
    with open(os.path.join(out, "part-0"), "w") as f:
        for _ in range(256):
            sparse = ",".join(str(rng.randint(0, vocab)) for _ in range(15))
            sess = ",".join(str(rng.randint(0, vocab))
                            for _ in range(rows * cols))
            f.write(f"{int(rng.rand() < 0.5)};{sparse};"
                    f"{rng.rand():.4f};{sess};{rng.randint(1, sess_count + 1)}\n")


def write_multimnist(root):
    """Pickle of (x uint8 (N, 36*36), y (N, 2)) — MultiMNIST format."""
    import pickle

    rng = np.random.RandomState(0)
    out = os.path.join(root, "multimnist")
    os.makedirs(out, exist_ok=True)
    x = rng.randint(0, 256, (128, 36 * 36)).astype(np.uint8)
    y = rng.randint(0, 10, (128, 2)).astype(np.int64)
    with open(os.path.join(out, "part-0.pickle"), "wb") as f:
        pickle.dump((x, y), f)


def write_edges(root, num_nodes=100):
    """Edge list ``src dst`` — deepwalk / graph GNN fixture (a ring plus
    random chords keeps every node connected)."""
    rng = np.random.RandomState(0)
    out = os.path.join(root, "edges")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "part-0"), "w") as f:
        for i in range(num_nodes):
            f.write(f"{i} {(i + 1) % num_nodes}\n")
        for _ in range(2 * num_nodes):
            f.write(f"{rng.randint(num_nodes)} {rng.randint(num_nodes)}\n")


def write_ensfm(root, n_users=60, n_items=40):
    """ENSFM interaction CSV: ``ufeats,ifeats`` (dash-joined tuples)."""
    rng = np.random.RandomState(0)
    out = os.path.join(root, "ensfm")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "part-0"), "w") as f:
        for _ in range(400):
            u, i = rng.randint(n_users), rng.randint(n_items)
            f.write(f"{u}-{u + n_users},{i}-{i + n_items}\n")


def write_tisas(root, n_users=48, n_items=100):
    """TiSAS TSV: ``user item rating timestamp``."""
    rng = np.random.RandomState(0)
    out = os.path.join(root, "tisas")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "part-0"), "w") as f:
        for u in range(n_users):
            t = 978000000 + rng.randint(0, 10000)
            for _ in range(rng.randint(4, 14)):
                t += rng.randint(60, 86400)
                f.write(f"{u}\t{rng.randint(1, n_items)}\t"
                        f"{rng.randint(1, 6)}\t{t}\n")


def write_iprec(root, n_users=100, n_items=100, n_bizs=50, f_max_len=4):
    """IPREC JSON-lines with the reference reader's key order."""
    import json

    rng = np.random.RandomState(0)
    out = os.path.join(root, "iprec")
    os.makedirs(out, exist_ok=True)

    def pack(n):
        flat = []
        for _ in range(n):
            flat += [int(rng.randint(n_items)), int(rng.randint(n_bizs))]
            flat += [int(rng.randint(n_users)) for _ in range(f_max_len)]
        return flat

    with open(os.path.join(out, "part-0"), "w") as f:
        for _ in range(128):
            row = {
                "user": int(rng.randint(n_users)),
                "item": int(rng.randint(n_items)),
                "biz": int(rng.randint(n_bizs)),
                "friends": [int(rng.randint(n_users)) for _ in range(3)],
                "user_items": [int(rng.randint(n_items)) for _ in range(6)],
                "user_bizs": [int(rng.randint(n_bizs)) for _ in range(6)],
                "user_friends": [int(rng.randint(n_users))
                                 for _ in range(5)],
                "user_packages": pack(3),
                "pack_neighbors_b": pack(2),
                "pack_neighbors_f": pack(2),
                "label1": int(rng.rand() < 0.5),
                "label2": 0,
            }
            f.write(json.dumps(row) + "\n")


def write_kim(root, n_news=50, n_entities=20, vocab=200, ent_dim=100):
    """KIM numeric MIND files: news.tsv / graph.tsv / entity_emb.npy /
    behaviors.tsv."""
    rng = np.random.RandomState(0)
    out = os.path.join(root, "kim")
    os.makedirs(out, exist_ok=True)
    np.save(os.path.join(out, "entity_emb.npy"),
            rng.randn(n_entities, ent_dim).astype(np.float32))
    with open(os.path.join(out, "news.tsv"), "w") as f:
        for n in range(n_news):
            toks = " ".join(str(rng.randint(1, vocab))
                            for _ in range(rng.randint(3, 8)))
            ents = " ".join(str(rng.randint(n_entities))
                            for _ in range(rng.randint(1, 3)))
            f.write(f"N{n}\t{toks}\t{ents}\n")
    with open(os.path.join(out, "graph.tsv"), "w") as f:
        for e in range(n_entities):
            nbs = " ".join(str(rng.randint(n_entities))
                           for _ in range(rng.randint(1, 3)))
            f.write(f"{e} {nbs}\n")
    with open(os.path.join(out, "behaviors.tsv"), "w") as f:
        for _ in range(128):
            clicked = ",".join(f"N{rng.randint(n_news)}"
                               for _ in range(rng.randint(1, 5)))
            pos = f"N{rng.randint(n_news)}"
            negs = ",".join(f"N{rng.randint(n_news)}" for _ in range(2))
            f.write(f"{clicked}\t{pos}\t{negs}\n")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    root = sys.argv[2] if len(sys.argv) > 2 else "test_tipc/data"
    if which in ("criteo", "all"):
        write_criteo(root)
    if which in ("census", "all"):
        write_census(root)
    if which in ("aliccp", "all"):
        write_aliccp(root)
    if which in ("dssm", "all"):
        write_dssm(root)
    if which in ("textcnn", "all"):
        write_textcnn(root)
    if which in ("ncf", "all"):
        write_ncf(root)
    if which in ("sign", "all"):
        write_sign(root)
    if which in ("dpin", "all"):
        write_dpin(root)
    if which in ("dsin", "all"):
        write_dsin(root)
    if which in ("multimnist", "all"):
        write_multimnist(root)
    if which in ("edges", "all"):
        write_edges(root)
    if which in ("ensfm", "all"):
        write_ensfm(root)
    if which in ("tisas", "all"):
        write_tisas(root)
    if which in ("iprec", "all"):
        write_iprec(root)
    if which in ("kim", "all"):
        write_kim(root)
    print(f"wrote TIPC sample data under {root}")
