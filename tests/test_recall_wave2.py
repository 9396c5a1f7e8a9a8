"""Recall wave 2: deepwalk, ensfm (non-sampling), tisas, mhcn + match/kim."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import get_model_class

SMALL = {
    "recall.deepwalk": {
        "hyper_parameters.num_nodes": 200, "hyper_parameters.embed_size": 16,
    },
    "recall.ensfm": {
        "hyper_parameters.num_users": 50, "hyper_parameters.num_items": 40,
        "hyper_parameters.mf_dim": 8, "hyper_parameters.max_positives": 6,
    },
    "recall.tisas": {
        "hyper_parameters.item_num": 100, "hyper_parameters.maxlen": 12,
        "hyper_parameters.time_span": 32, "hyper_parameters.hidden_units": 16,
        "hyper_parameters.num_heads": 2,
    },
    "recall.mhcn": {
        "hyper_parameters.demo_graph": True,
        "hyper_parameters.num_users": 30, "hyper_parameters.num_items": 25,
        "hyper_parameters.num_factors": 16,
    },
    "match.kim": {
        "hyper_parameters.vocab_size": 200, "hyper_parameters.max_sents": 4,
        "hyper_parameters.max_sentence": 6,
        "hyper_parameters.max_entity_num": 3, "hyper_parameters.npratio": 2,
        "hyper_parameters.embedding_size": 32,
        "hyper_parameters.hidden_size": 40,
    },
}


def make(name):
    return get_model_class(name)(Config({
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
        **SMALL[name],
    }))


@pytest.mark.parametrize("name", sorted(SMALL))
def test_forward_and_grads(name):
    md = make(name)
    params = md.init_params(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, md.example_batch(4))
    kw = (
        {"rng": jax.random.PRNGKey(1)}
        if getattr(md, "stochastic", False)
        else {}
    )
    loss, aux = md.train_forward(params, batch, **kw)
    g = jax.grad(lambda p: md.train_forward(p, batch, **kw)[0])(params)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(optax.global_norm(g)))


@pytest.mark.parametrize("name", ["recall.deepwalk", "recall.tisas",
                                  "recall.mhcn"])
def test_learns(name):
    md = make(name)
    batch = jax.tree.map(jnp.asarray, md.example_batch(16))
    params = md.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(0.01)
    opt = tx.init(params)
    stochastic = getattr(md, "stochastic", False)

    @jax.jit
    def step(params, opt, key):
        kw = {"rng": key} if stochastic else {}
        (loss, _), g = jax.value_and_grad(
            lambda p: md.train_forward(p, batch, **kw), has_aux=True
        )(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for i in range(30):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
        first = float(loss) if first is None else first
        last = float(loss)
    assert last < first, f"{name}: {first} -> {last}"


def test_deepwalk_walk_dataset(tmp_path):
    data = tmp_path / "train"
    data.mkdir()
    # a ring graph of 20 nodes
    with open(data / "edges.txt", "w") as f:
        for i in range(20):
            f.write(f"{i} {(i + 1) % 20}\n")
    md = get_model_class("recall.deepwalk")(Config({
        "hyper_parameters.num_nodes": 20,
        "hyper_parameters.embed_size": 8,
        "hyper_parameters.walk_len": 10,
        "hyper_parameters.win_size": 2,
        "hyper_parameters.neg_num": 3,
    }))
    batches = list(md.make_dataset(str(data), 32))
    assert batches, "walk sampler yielded nothing"
    b = batches[0]
    assert b["src"].shape == (32,)
    assert b["dsts"].shape == (32, 4)  # 1 pos + 3 neg
    # ring: positive contexts within window distance
    dist = np.abs(b["src"] - b["dsts"][:, 0])
    dist = np.minimum(dist, 20 - dist)
    assert dist.max() <= 2


def test_ensfm_nonsampling_loss_matches_bruteforce():
    """Closed-form all-pair term == explicit sum over every (u, i) pair."""
    md = make("recall.ensfm")
    params = md.init_params(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, md.example_batch(4))
    pre, pos_r, q_emb, p_emb, h_emb = md.module.apply(
        {"params": params}, *md.model_inputs(batch)
    )
    w = md.negative_weight
    closed = w * jnp.sum(
        (q_emb.T @ q_emb) * (p_emb.T @ p_emb) * (h_emb @ h_emb.T)
    )
    brute = w * jnp.sum(jnp.square(pre))
    np.testing.assert_allclose(float(closed), float(brute), rtol=1e-4)


def test_tisas_causality():
    """Changing a FUTURE item must not change logits at earlier positions."""
    md = make("recall.tisas")
    params = md.init_params(jax.random.PRNGKey(0))
    batch = md.example_batch(2)
    b1 = jax.tree.map(jnp.asarray, batch)
    batch2 = {k: v.copy() for k, v in batch.items()}
    batch2["log_seqs"][:, -1] = (batch2["log_seqs"][:, -1] % 99) + 1
    b2 = jax.tree.map(jnp.asarray, batch2)
    p1, _ = md.module.apply({"params": params}, *md.model_inputs(b1))
    p2, _ = md.module.apply({"params": params}, *md.model_inputs(b2))
    np.testing.assert_allclose(
        np.asarray(p1[:, :-1]), np.asarray(p2[:, :-1]), rtol=1e-5
    )


def test_mhcn_motif_adjacency_rows_normalized():
    from paddlerec_tpu.models.recall.mhcn.model import build_motif_adjacency

    rng = np.random.RandomState(0)
    social = (rng.rand(20, 20) < 0.3).astype(np.float32)
    np.fill_diagonal(social, 0)
    rating = (rng.rand(20, 15) < 0.3).astype(np.float32)
    h_s, h_j, h_p, r = build_motif_adjacency(social, rating)
    for m in (h_s, h_j, h_p):
        sums = m.sum(1)
        nonzero = sums[sums > 0]
        np.testing.assert_allclose(nonzero, 1.0, rtol=1e-5)
    assert r.shape == (20, 15)


def test_kim_scores_candidates():
    md = make("match.kim")
    params = md.init_params(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, md.example_batch(2))
    scores = md.module.apply({"params": params}, *md.model_inputs(batch))
    assert scores.shape == (2, 3)  # 1 pos + 2 neg
