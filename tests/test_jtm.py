"""JTM joint tree-model learning (VERDICT r1 missing item 3; reference
models/treebased/jtm/tree_learning.py + user_preference.py)."""

import numpy as np
import pytest

from paddlerec_tpu.models.treebased.jtm import (
    assign_parent,
    collect_sample_sets,
    descendants_at,
    path_codes,
    tree_learning,
)
from paddlerec_tpu.models.treebased.tree import TreeIndex


def _balanced_tree(n_items: int, branch: int = 2) -> TreeIndex:
    ids = np.arange(1, n_items + 1, dtype=np.int64)
    emb = np.random.RandomState(0).rand(n_items, 4)
    return TreeIndex.build_by_kmeans(ids, emb, branch=branch)


def test_descendants_and_paths():
    tree = _balanced_tree(8)
    # root's descendants at level 1 are the tree's level-1 codes
    np.testing.assert_array_equal(
        descendants_at(tree, 0, 1), tree.level_codes[1]
    )
    # path from a leaf to the root excludes the root, includes the leaf
    leaf = int(tree.codes[0])
    p = path_codes(leaf, 0, tree.branch)
    assert p[0] == leaf and 0 not in p
    assert len(p) == tree.max_level


def test_tree_learning_is_valid_permutation():
    """The relearned tree must assign every item to a distinct leaf at
    the same depth (capacity 2^0 = 1 at l_max)."""
    tree = _balanced_tree(16)
    rng = np.random.RandomState(1)

    def weight_fn(items, nodes):
        return rng.rand(len(items), len(np.asarray(nodes).reshape(-1)))

    new = tree_learning(tree, weight_fn, gap=2)
    assert new.max_level == tree.max_level
    assert sorted(new.item_ids.tolist()) == sorted(tree.item_ids.tolist())
    assert len(set(new.codes.tolist())) == len(new.codes)  # distinct leaves
    levels = {new._level(int(c)) for c in new.codes}
    assert levels == {new.max_level}


def test_tree_learning_follows_preferences():
    """With a deterministic preference for the item's ORIGINAL subtree,
    the relearned tree reproduces the original assignment (Algorithm 2
    is preference-maximizing)."""
    tree = _balanced_tree(8)
    leaf_of = {int(i): int(c) for i, c in zip(tree.item_ids, tree.codes)}

    def weight_fn(items, nodes):
        nodes = np.asarray(nodes).reshape(-1)
        out = np.zeros((len(items), len(nodes)), np.float32)
        for i, it in enumerate(np.asarray(items).reshape(-1)):
            # prefer nodes on the path to the item's original leaf
            anc = set(tree.ancestors(leaf_of[int(it)]))
            out[i] = [10.0 if int(n) in anc else 0.1 for n in nodes]
        return out

    new = tree_learning(tree, weight_fn, gap=1)
    got = {int(i): int(c) for i, c in zip(new.item_ids, new.codes)}
    assert got == leaf_of


def test_capacity_rebalance():
    """When every item prefers ONE node, capacity forces spill to the
    next-best candidates — no node may exceed 2^(l_max-l)."""
    tree = _balanced_tree(8)
    l = 1
    cands = descendants_at(tree, 0, l)

    def weight_fn(items, nodes):
        nodes = np.asarray(nodes).reshape(-1)
        # everyone loves the first candidate's subtree
        fav = set(path_codes(int(cands[0]), 0, tree.branch))
        w = np.asarray(
            [[5.0 if int(n) in fav else 1.0 for n in nodes]]
            * len(items), np.float32
        )
        return w

    out = assign_parent(
        tree, tree.max_level, l, 0, [int(i) for i in tree.item_ids],
        weight_fn, {},
    )
    counts = {}
    for node in out.values():
        counts[node] = counts.get(node, 0) + 1
    cap = 2 ** (tree.max_level - l)
    assert all(c <= cap for c in counts.values()), counts
    assert len(out) == 8  # nobody dropped


def test_jtm_end_to_end(tmp_path):
    """The full alternating loop through the CLI config surface:
    train TDM -> learn tree -> train again; tree stays valid and
    training still runs on the relearned codes."""
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.models.treebased.jtm import jtm_train

    n_items = 16
    tree = _balanced_tree(n_items)
    tree.save(str(tmp_path / "tree"))
    rng = np.random.RandomState(0)
    data = tmp_path / "train"
    data.mkdir()
    with open(data / "part-0", "w") as f:
        for _ in range(96):
            hist = rng.randint(1, n_items + 1, 6)
            tgt = rng.randint(1, n_items + 1)
            f.write(" ".join(map(str, hist)) + f" | {tgt}\n")
    cfg = Config({
        "runner.model": "treebased.tdm",
        "runner.train_data_dir": str(data),
        "runner.train_batch_size": 16,
        "runner.epochs": 1,
        "runner.print_interval": 100,
        "runner.jtm_rounds": 2,
        "runner.model_save_path": str(tmp_path / "out"),
        "hyper_parameters.tree_path": str(tmp_path / "tree.npz"),
        "hyper_parameters.fea_groups": "3,3",
        "hyper_parameters.node_emb_size": 8,
        "hyper_parameters.jtm_gap": 2,
        "hyper_parameters.jtm_sample_nums": 2,
        "hyper_parameters.optimizer.learning_rate": 0.01,
    })
    metrics, new_tree = jtm_train(cfg)
    assert metrics["total_ins"] > 0
    assert sorted(new_tree.item_ids.tolist()) == list(range(1, n_items + 1))
    assert len(set(new_tree.codes.tolist())) == n_items
    import os

    assert os.path.exists(tmp_path / "out" / "jtm_tree_round0.npz")
    assert os.path.exists(tmp_path / "out" / "jtm_tree_round1.npz")


def test_collect_sample_sets_caps():
    batches = [{
        "hist_ids": np.arange(8).reshape(4, 2),
        "item_id": np.asarray([7, 7, 7, 9]),
    }]
    sets = collect_sample_sets(batches, max_samples=2)
    assert len(sets[7]) == 2 and len(sets[9]) == 1


def test_tree_learning_ragged_tree():
    """Item counts that are not a power of ``branch`` leave the last
    level ragged: per-subtree capacity is its actual leaf-slot count,
    not the flat 2^(l_max-l) (which overfilled and raised mid-learn on
    the 1500-item retrieval corpus)."""
    for n_items in (11, 23, 1500 // 30):
        ids = np.arange(n_items, dtype=np.int64)
        cats = np.random.RandomState(3).randint(0, 5, n_items)
        tree = TreeIndex.build_by_category(ids, cats)
        rng = np.random.RandomState(4)

        def weight_fn(items, nodes):
            return rng.rand(len(items), len(np.asarray(nodes).reshape(-1)))

        new = tree_learning(tree, weight_fn, gap=3)
        assert sorted(new.item_ids.tolist()) == sorted(ids.tolist())
        assert len(set(new.codes.tolist())) == n_items  # distinct leaves
