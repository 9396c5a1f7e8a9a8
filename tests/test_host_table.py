"""HostTieredTable — the GPUBox/HeterPS pass-cache analog."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def test_pass_protocol_roundtrip():
    from paddlerec_tpu.parallel.host_table import HostTieredTable

    tbl = HostTieredTable(vocab=10_000_000, dim=8, seed=1)
    ids = np.asarray([3, 9_999_999, 42, 3, 42])
    cache = tbl.begin_pass(ids)
    assert cache.shape == (3, 8)  # deduped
    assert tbl.rows_resident == 3  # lazy: only touched rows materialize
    # deterministic per-row init (same seed -> same rows next time)
    tbl2 = HostTieredTable(vocab=10_000_000, dim=8, seed=1)
    np.testing.assert_allclose(tbl2.begin_pass(ids), cache)
    # translate maps global ids to cache slots
    slots = tbl.translate(np.asarray([[42, 3], [9_999_999, 42]]))
    assert slots.shape == (2, 2)
    np.testing.assert_array_equal(
        np.asarray(tbl._pass_ids)[slots.reshape(-1)], [42, 3, 9_999_999, 42]
    )
    # ids outside the pass raise with the offenders named
    with pytest.raises(KeyError, match="7777"):
        tbl.translate([7777])
    # flush persists
    trained = np.asarray(cache) + 1.0
    tbl.end_pass(trained)
    np.testing.assert_allclose(tbl.lookup_host([3]), trained[0:1])
    with pytest.raises(RuntimeError):
        tbl.translate([3])  # pass closed


def test_out_of_range_and_bad_flush():
    from paddlerec_tpu.parallel.host_table import HostTieredTable

    tbl = HostTieredTable(vocab=100, dim=4)
    with pytest.raises(ValueError, match="out of range"):
        tbl.begin_pass([5, 100])
    cache = tbl.begin_pass([1, 2])
    with pytest.raises(ValueError, match="cache shape"):
        tbl.end_pass(np.zeros((3, 4), np.float32))
    tbl.end_pass(np.asarray(cache))


def test_eviction_lifecycle():
    from paddlerec_tpu.parallel.host_table import HostTieredTable

    tbl = HostTieredTable(vocab=1000, dim=4, show_decay=0.5)
    tbl.end_pass(tbl.begin_pass([1, 2, 3]))
    tbl.end_pass(tbl.begin_pass([1]))  # id 1 seen twice
    for _ in range(3):
        tbl.end_day()
    evicted = tbl.shrink(threshold=0.2)
    assert evicted == 2  # 2 and 3 went cold; 1 survives (2 * 0.125 = 0.25)
    assert tbl.rows_resident == 1
    # evicted rows read back as zeros and re-init on next touch
    assert np.allclose(tbl.lookup_host([2]), 0.0)
    assert np.abs(np.asarray(tbl.begin_pass([2]))).sum() > 0


def test_learning_across_passes():
    """Two passes over a planted embedding-regression problem: the cache
    trains on device, end_pass persists, and the second pass resumes
    from the trained rows (loss keeps falling)."""
    from paddlerec_tpu.parallel.host_table import (
        HostTieredTable, pass_train_loop,
    )

    vocab, dim, bs = 50_000, 8, 64
    rng = np.random.RandomState(0)
    target = rng.randn(32, dim).astype(np.float32)  # 32 hot ids
    hot_ids = rng.choice(vocab, 32, replace=False).astype(np.int64)

    def make_batches(n):
        for _ in range(n):
            pick = rng.randint(0, 32, bs)
            yield {"ids": hot_ids[pick], "y": target[pick]}

    tbl = HostTieredTable(vocab=vocab, dim=dim, seed=0)
    tx = optax.adagrad(1.0)

    @jax.jit
    def grad_fn(cache, batch):
        def loss(c):
            emb = c[batch["slots"]]
            return jnp.mean((emb - batch["y"]) ** 2)

        return jax.grad(loss)(cache)

    losses = []
    for _pass in range(2):
        batches = list(make_batches(80))
        cache = tbl.begin_pass(np.concatenate([b["ids"] for b in batches]))
        opt_state = tx.init(cache)
        first = tbl.translate(batches[0]["ids"])
        losses.append(float(jnp.mean(
            (cache[jnp.asarray(first)] - batches[0]["y"]) ** 2
        )))
        cache, _ = pass_train_loop(tbl, batches, grad_fn, tx.update,
                                   opt_state, cache)
        tbl.end_pass(cache)
    assert losses[1] < losses[0] * 0.3, losses
    # host rows converged to the planted targets
    got = tbl.lookup_host(hot_ids)
    assert float(np.mean((got - target) ** 2)) < 0.05
    # only the hot rows (plus none else) ever materialized
    assert tbl.rows_resident == 32
