"""ShardedEmbedding: all_to_all routed lookup must exactly match the plain
single-device packed lookup, forward and backward, on a (dp × mp) mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerec_tpu.ops.packed_embedding import packed_lookup
from paddlerec_tpu.parallel.embedding import ShardedEmbedding, bucket_capacity
from paddlerec_tpu.parallel.mesh import create_mesh


@pytest.fixture(params=[(2, 4), (4, 2), (8, 1), (1, 8)])
def mesh(request):
    dp, mp = request.param
    return create_mesh(dp, mp)


def _ref_lookup(table_rows, ids, eng):
    """Plain packed lookup over the same (rows,128) table."""
    return packed_lookup(table_rows, ids % eng.vocab_size, eng.embedding_dim)


def test_lookup_matches_plain(mesh, rng):
    vocab, dim = 4096, 9
    eng = ShardedEmbedding(mesh, vocab, dim)
    table = eng.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(rng.randint(0, vocab, size=(64, 26)), jnp.int32)

    out = jax.jit(eng.lookup)(table, ids)
    ref = _ref_lookup(jnp.asarray(jax.device_get(table)), ids, eng)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_gradient_matches_plain(mesh, rng):
    vocab, dim = 2048, 9
    eng = ShardedEmbedding(mesh, vocab, dim)
    table = eng.init(jax.random.PRNGKey(1))
    # duplicates included to exercise accumulation across devices
    ids_np = rng.randint(0, vocab, size=(32, 8))
    ids_np[:7] = ids_np[0]
    ids = jnp.asarray(ids_np, jnp.int32)
    tgt = jnp.asarray(rng.randn(32, 8, dim).astype(np.float32))

    def loss_sharded(t):
        return jnp.sum((eng.lookup(t, ids) - tgt) ** 2)

    def loss_plain(t):
        return jnp.sum((_ref_lookup(t, ids, eng) - tgt) ** 2)

    g_sharded = jax.device_get(jax.jit(jax.grad(loss_sharded))(table))
    g_plain = jax.device_get(
        jax.grad(loss_plain)(jnp.asarray(jax.device_get(table)))
    )
    np.testing.assert_allclose(g_sharded, g_plain, rtol=1e-4, atol=1e-5)


def test_train_converges_on_mesh(rng):
    """End-to-end: regression onto embeddings through the sharded path."""
    mesh = create_mesh(2, 4)
    vocab, dim = 1024, 8
    eng = ShardedEmbedding(mesh, vocab, dim)
    table = eng.init(jax.random.PRNGKey(2))
    # distinct ids: each row converges to its own target under plain GD
    ids = jnp.asarray(rng.permutation(vocab)[:256].reshape(64, 4), jnp.int32)
    tgt = jnp.asarray(rng.randn(64, 4, dim).astype(np.float32))

    @jax.jit
    def step(t):
        loss, g = jax.value_and_grad(
            lambda tt: jnp.sum((eng.lookup(tt, ids) - tgt) ** 2)
        )(t)
        return t - 0.4 * g, loss

    losses = []
    for _ in range(60):
        table, loss = step(table)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2


def test_hot_id_dedup_no_overflow():
    """A single hot id repeated everywhere must not overflow buckets —
    dedup sends each distinct id once."""
    mesh = create_mesh(1, 8)
    vocab, dim = 1024, 8
    eng = ShardedEmbedding(mesh, vocab, dim, capacity_factor=0.05)
    table = eng.init(jax.random.PRNGKey(0))
    ids = jnp.full((32, 8), 3, jnp.int32)
    vecs, overflow = jax.jit(eng.lookup_with_overflow)(table, ids)
    assert int(np.asarray(overflow).sum()) == 0
    ref = _ref_lookup(jnp.asarray(jax.device_get(table)), ids, eng)
    np.testing.assert_allclose(np.asarray(vecs), np.asarray(ref), rtol=1e-6)


def test_overflow_counting():
    mesh = create_mesh(1, 8)
    vocab, dim = 16384, 8  # pack=16 → 1024 physical rows, 128 per shard
    # tiny capacity (clamps to 8) + 16 distinct shard-0 rows per device
    eng = ShardedEmbedding(mesh, vocab, dim, capacity_factor=0.05)
    table = eng.init(jax.random.PRNGKey(0))
    ids = (jnp.arange(256, dtype=jnp.int32) * 8).reshape(32, 8)  # phys 0..127
    vecs, overflow = jax.jit(eng.lookup_with_overflow)(table, ids)
    assert int(np.asarray(overflow).sum()) > 0
    # overflowed lookups fall back to zeros, never garbage
    assert np.isfinite(np.asarray(vecs)).all()


def test_bucket_capacity_static():
    assert bucket_capacity(1000, 8, 1.5) % 8 == 0
    assert bucket_capacity(1000, 8, 1.5) >= 1000 / 8 * 1.5 - 8
