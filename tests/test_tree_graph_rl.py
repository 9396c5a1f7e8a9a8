"""Treebased TDM, graph GNN family, RL a2c, movie demo pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import get_model_class
from paddlerec_tpu.models.treebased.tree import TreeIndex


def small_tree(n_items=32, dim=4, seed=0):
    rng = np.random.RandomState(seed)
    emb = np.concatenate(
        [rng.randn(n_items // 2, dim) + 3, rng.randn(n_items // 2, dim) - 3]
    )
    return TreeIndex.build_by_kmeans(np.arange(n_items), emb), emb


class TestTree:
    def test_kmeans_codes_unique_and_aligned(self):
        tree, _ = small_tree()
        assert len(set(tree.codes.tolist())) == 32
        levels = {tree._level(int(c)) for c in tree.codes}
        assert len(levels) == 1  # all leaves on the deepest level

    def test_kmeans_groups_similar_items(self):
        tree, emb = small_tree()
        # items from the same cluster should share the level-1 subtree
        top = {
            int(i): tree.ancestors(int(c))[-1]
            for i, c in zip(tree.item_ids, tree.codes)
        }
        first = [top[i] for i in range(16)]
        second = [top[i] for i in range(16, 32)]
        # majority of each cluster under one child of the root
        assert max(first.count(x) for x in set(first)) >= 12
        assert max(second.count(x) for x in set(second)) >= 12

    def test_category_builder(self):
        tree = TreeIndex.build_by_category(
            np.arange(16), np.repeat(np.arange(4), 4)
        )
        assert len(set(tree.codes.tolist())) == 16

    def test_save_load(self, tmp_path):
        tree, _ = small_tree()
        tree.save(str(tmp_path / "tree"))
        tree2 = TreeIndex.load(str(tmp_path / "tree"))
        assert np.array_equal(tree.codes, tree2.codes)

    def test_sampling_layers(self):
        tree, _ = small_tree()
        rng = np.random.RandomState(0)
        units, labels = tree.sample(np.asarray([3, 7]), neg_per_layer=2,
                                    rng=rng)
        per_layer = 3
        layers = tree.max_level
        assert units.shape == (2, layers * per_layer)
        # positives are the exact ancestor chain
        code = int(tree.codes[3])
        anc = {tree._level(c): c for c in tree.ancestors(code)}
        for li in range(layers):
            lv = 1 + li
            assert units[0, li * per_layer] == anc[lv]
            assert labels[0, li * per_layer] == 1.0
            assert labels[0, li * per_layer + 1] == 0.0


class TestTDM:
    def _model(self, tree):
        md = get_model_class("treebased.tdm")(Config({
            "hyper_parameters.node_emb_size": 8,
            "hyper_parameters.fea_groups": "4,4,2",
            "hyper_parameters.neg_sampling_list": 2,
            "hyper_parameters.optimizer.class": "Adam",
            "hyper_parameters.optimizer.learning_rate": 0.001,
        }))
        md.set_tree(tree)
        return md

    def test_train_and_retrieve(self):
        tree, _ = small_tree()
        md = self._model(tree)
        params = md.init_params(jax.random.PRNGKey(0))
        batch = jax.tree.map(jnp.asarray, md.example_batch(8))
        loss, aux = md.train_forward(params, batch)
        assert np.isfinite(float(loss))
        rng = np.random.RandomState(0)
        hist = jnp.asarray(np.take(tree.codes, rng.randint(0, 32, (3, 10))))
        res = md.retrieve(params, hist, jnp.ones((3, 10), jnp.float32),
                          topk=5, beam=8)
        assert all(1 <= len(r) <= 5 for r in res)
        assert all(i in set(tree.item_ids.tolist()) for r in res for i in r)

    def test_dataset_sampling(self, tmp_path):
        tree, _ = small_tree()
        md = self._model(tree)
        data = tmp_path / "train"
        data.mkdir()
        rng = np.random.RandomState(0)
        with open(data / "part-0", "w") as f:
            for _ in range(20):
                hist = rng.randint(0, 32, 6)
                f.write(" ".join(map(str, hist)) + f" | {rng.randint(0,32)}\n")
        batches = list(md.make_dataset(str(data), 8))
        assert batches
        b = batches[0]
        assert b["unit_codes"].shape[1] == tree.max_level * 3
        assert b["labels"][:, 0].max() == 1.0


GRAPH_CONVS = ["lightgcn", "gin", "graphsage_mean", "graphsage_bow",
               "graphsage_max", "gat", "transformer_conv"]


class TestGraph:
    @pytest.mark.parametrize("conv", GRAPH_CONVS)
    def test_convs_forward(self, conv):
        md = get_model_class("graph.gnn")(Config({
            "hyper_parameters.num_nodes": 300,
            "hyper_parameters.emb_size": 16,
            "hyper_parameters.samples": "4,3",
            "hyper_parameters.neg_num": 3,
            "hyper_parameters.sage_layer_type": conv,
        }))
        params = md.init_params(jax.random.PRNGKey(0))
        batch = jax.tree.map(jnp.asarray, md.example_batch(8))
        loss, _ = md.train_forward(params, batch)
        g = jax.grad(lambda p: md.train_forward(p, batch)[0])(params)
        assert np.isfinite(float(loss))
        assert np.isfinite(float(optax.global_norm(g)))

    @pytest.mark.parametrize("loss_type", ["nce", "hinge", "sigmoid"])
    def test_losses(self, loss_type):
        md = get_model_class("graph.deepwalk_million")(Config({
            "hyper_parameters.num_nodes": 100,
            "hyper_parameters.emb_size": 8,
            "hyper_parameters.neg_num": 2,
            "hyper_parameters.loss_type": loss_type,
        }))
        params = md.init_params(jax.random.PRNGKey(0))
        batch = jax.tree.map(jnp.asarray, md.example_batch(8))
        loss, _ = md.train_forward(params, batch)
        assert np.isfinite(float(loss))

    def test_walk_dataset_with_sampling(self, tmp_path):
        data = tmp_path / "graph"
        data.mkdir()
        with open(data / "edges.txt", "w") as f:
            for i in range(30):
                f.write(f"{i} {(i + 1) % 30}\n")
        md = get_model_class("graph.lightgcn")(Config({
            "hyper_parameters.num_nodes": 30,
            "hyper_parameters.emb_size": 8,
            "hyper_parameters.samples": "3",
            "hyper_parameters.walk_times": 1,
            "hyper_parameters.walk_len": 5,
        }))
        batches = list(md.make_dataset(str(data), 16))
        assert batches
        b = batches[0]
        assert b["pair_nodes"].shape == (16, 2)
        assert b["neigh_0"].shape == (16, 2, 3)
        # ring: sampled neighbors are true graph neighbors
        diff = np.abs(b["pair_nodes"][..., None] - b["neigh_0"])
        diff = np.minimum(diff, 30 - diff)
        assert diff.max() <= 1


class TestA2C:
    def test_cartpole_improves(self):
        md = get_model_class("rl.a2c")(Config({
            "hyper_parameters.num_envs": 8,
            "hyper_parameters.hidden_size": 64,
            "hyper_parameters.optimizer.learning_rate": 1e-3,
        }))
        params, history = md.train(total_frames=12000, seed=0, log_every=4000)
        assert history[-1] > 50, f"no learning: {history}"

    def test_env_dynamics(self):
        from paddlerec_tpu.models.rl.a2c.model import env_reset, env_step

        env = env_reset(jax.random.PRNGKey(0), 4)
        env2, reward, done = env_step(env, jnp.ones((4,), jnp.int32))
        assert reward.shape == (4,)
        assert not bool(done.any())  # one step from fresh start never ends
        # pushing right increases x velocity
        assert float((env2.obs[:, 1] - env.obs[:, 1]).min()) > 0


class TestMovieDemo:
    def test_two_stage_pipeline(self):
        from paddlerec_tpu.models.demo.movie_recommand.model import ann_topk

        cfg = Config({
            "hyper_parameters.sparse_feature_number": 5000,
            "hyper_parameters.fc_sizes": [64, 32],
        })
        recall = get_model_class("demo.movie_recall")(cfg)
        rank = get_model_class("demo.movie_rank")(cfg)
        rp = recall.init_params(jax.random.PRNGKey(0))
        kp = rank.init_params(jax.random.PRNGKey(1))
        batch = jax.tree.map(jnp.asarray, recall.example_batch(16))
        # stage 1: vectors + ANN
        uv = np.asarray(recall.user_vector(rp, batch))
        mv = np.asarray(recall.movie_vector(rp, batch))
        vals, idx = ann_topk(uv, mv, 5)
        assert idx.shape == (16, 5)
        assert np.all(np.diff(vals, axis=1) <= 1e-6)  # sorted descending
        # stage 2: rank the recalled movies for user 0
        sel = {
            k: (v[idx[0]] if k != "user_sparse" else
                jnp.broadcast_to(v[0:1], (5,) + v.shape[1:]))
            for k, v in batch.items()
        }
        scores, _ = rank.train_forward(kp, sel)
        assert np.isfinite(float(scores))


def test_category_tree_pads_leaves_to_uniform_depth():
    """Non-power-of-branch catalogs: build_by_category must align all
    leaves to the deepest level, else sample() emits wrong positives
    (regression: 6-item tree put leaves at levels 2 AND 3)."""
    import numpy as np

    from paddlerec_tpu.models.treebased.tree import TreeIndex

    for n in (6, 23, 100):
        tree = TreeIndex.build_by_category(np.arange(n), np.zeros(n))
        levels = {tree._static_level(int(c), tree.branch)
                  for c in tree.codes}
        assert len(levels) == 1, (n, levels)
        rng = np.random.RandomState(0)
        targets = np.asarray([0, n // 2, n - 1])
        units, labels = tree.sample(targets, neg_per_layer=2, rng=rng)
        for r, item in enumerate(targets):
            leaf = int(tree.codes[list(tree.item_ids).index(item)])
            anc = set(tree.ancestors(leaf))
            pos = units[r][labels[r] == 1]
            assert all(int(c) in anc for c in pos), (n, item)
