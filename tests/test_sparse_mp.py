"""Composed sparse_update × model-parallel tables.

The round-2 build refused this combination; round 3 implements it: the
delta grad tap rides the all_to_all exchange
(parallel/embedding.py lookup_external) and the row-wise optimizer runs
shard-locally over the P(mp, None) table
(ops/sparse_update.apply_sparse_*_sharded).  This is the reference's
production regime — per-feature accessors over PS-sharded tables
(/root/reference/tools/utils/static_ps/config_fleet.py:60-104) — for
vocabularies past both the single-chip HBM bound and the dense-mp bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.data.synthetic import write_criteo_sample
from paddlerec_tpu.parallel import sharding as shd
from paddlerec_tpu.parallel.mesh import MP_AXIS, create_mesh
from paddlerec_tpu.train.trainer import Trainer


@pytest.fixture
def low_shard_threshold():
    old = shd.MIN_ROWS_TO_SHARD
    shd.MIN_ROWS_TO_SHARD = 64
    yield
    shd.MIN_ROWS_TO_SHARD = old


def _sparse_cfg(tmp_path, rule="adam", **extra):
    cfg = Config({
        "runner.model": "rank.deepfm",
        "runner.train_data_dir": str(tmp_path / "train"),
        "runner.train_batch_size": 32,
        "runner.epochs": 1,
        "runner.print_interval": 100,
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.sparse_feature_number": 10000,
        "hyper_parameters.sparse_feature_dim": 9,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.fc_sizes": [32, 16],
        "hyper_parameters.distributed_embedding": 1,
        "hyper_parameters.sparse_update": True,
        "hyper_parameters.sparse_update_rule": rule,
    })
    for k, v in extra.items():
        cfg[k] = v
    return cfg


def _train(tmp_path, dp, mp, rule):
    tr = Trainer(_sparse_cfg(tmp_path, rule), mesh=create_mesh(dp, mp))
    m = tr.train()
    tbl = np.asarray(
        jax.device_get(tr.state.params["embedding"]["embedding"])
    )
    return tr, m, tbl


@pytest.mark.parametrize("rule", ["adam", "adagrad"])
def test_sparse_mp_matches_single_chip(tmp_path, low_shard_threshold, rule):
    """The mp-sharded row-wise update must reproduce the packed
    single-chip external path to float32 rounding (the same f32 math runs
    per shard; only the table layout differs)."""
    write_criteo_sample(str(tmp_path / "train"), num_lines=256, num_files=4,
                        vocab=10000)
    _, m0, t0 = _train(tmp_path, 8, 1, rule)  # packed external (mp=1)
    tr, m1, t1 = _train(tmp_path, 2, 4, rule)  # engine external, dp×mp
    assert m0["auc"] == pytest.approx(m1["auc"], abs=1e-9)
    r = t0.shape[0]  # mp table rows are padded to an mp multiple
    np.testing.assert_allclose(t1[:r], t0, atol=1e-7)
    # the row-wise state must live on the mp sharding, not replicated
    assert tr._mp_table_paths() == frozenset({"embedding/embedding"})
    for st in tr.state.extra.values():
        for leaf in jax.tree.leaves(st):
            assert leaf.sharding.spec[0] == MP_AXIS, leaf.sharding
    # padded tail rows (beyond the real vocab) must stay untouched
    assert np.all(np.isfinite(t1))


def test_sharded_apply_matches_compact_kernel(low_shard_threshold):
    """Kernel-level parity: apply_sparse_adagrad_sharded on a P(mp)
    table == apply_sparse_adagrad_compact on the same (replicated)
    arrays, including sentinel-padded uniq entries."""
    from paddlerec_tpu.ops.sparse_update import (
        SENTINEL,
        RowwiseAdagradState,
        apply_sparse_adagrad_compact,
        apply_sparse_adagrad_sharded,
    )

    mesh = create_mesh(2, 4)
    rows, n = 256, 64
    rng = np.random.RandomState(0)
    table = rng.randn(rows, 128).astype(np.float32)
    acc = np.abs(rng.randn(rows)).astype(np.float32)
    grads = rng.randn(n, 128).astype(np.float32)
    phys = rng.randint(0, rows, size=n).astype(np.int32)
    uniq_vals, slot = np.unique(phys, return_inverse=True)
    uniq = np.full(n, SENTINEL, np.int32)
    uniq[: len(uniq_vals)] = uniq_vals

    t_ref, s_ref = apply_sparse_adagrad_compact(
        jnp.asarray(table), RowwiseAdagradState(acc=jnp.asarray(acc)),
        jnp.asarray(grads), jnp.asarray(uniq),
        jnp.asarray(slot.astype(np.int32)), lr=0.01,
    )

    tbl_sh = jax.device_put(
        jnp.asarray(table), NamedSharding(mesh, P(MP_AXIS, None))
    )
    acc_sh = jax.device_put(
        jnp.asarray(acc), NamedSharding(mesh, P(MP_AXIS))
    )

    @jax.jit
    def go(tbl, ac, g, u, s):
        return apply_sparse_adagrad_sharded(
            mesh, tbl, RowwiseAdagradState(acc=ac), g, u, s, lr=0.01
        )

    t_mp, s_mp = go(tbl_sh, acc_sh, jnp.asarray(grads), jnp.asarray(uniq),
                    jnp.asarray(slot.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(t_mp), np.asarray(t_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_mp.acc), np.asarray(s_ref.acc),
                               atol=1e-6)


def test_engine_external_lookup_grads(low_shard_threshold):
    """lookup_external: vecs match the plain engine lookup and delta
    grads arrive per-position (the tap contract the row-wise optimizer
    consumes)."""
    from paddlerec_tpu.parallel.embedding import ShardedEmbedding

    mesh = create_mesh(2, 4)
    eng = ShardedEmbedding(mesh, vocab_size=4096, embedding_dim=9)
    table = eng.init(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (16, 13), 0, 4096)
    delta = jnp.zeros((16 * 13, 128), jnp.float32)

    vecs_ref = eng.lookup(table, ids)
    vecs_ext, overflow = eng.lookup_external(table, delta, ids)
    np.testing.assert_allclose(np.asarray(vecs_ext), np.asarray(vecs_ref),
                               atol=1e-6)
    assert int(jnp.sum(overflow)) == 0

    def loss(d):
        v, _ = eng.lookup_external(table, d, ids)
        return jnp.sum(v * v)

    g = jax.grad(loss)(delta)
    # every lookup position must carry a gradient row; the sub-lane
    # routing confines it to that id's pack slice
    gn = np.asarray(jnp.abs(g).sum(axis=1))
    assert (gn[: 16 * 13] > 0).all()


def test_sparse_mp_small_table_falls_back_to_local(tmp_path):
    """A table below MIN_ROWS_TO_SHARD stays replicated (param_spec
    refuses to row-shard it), so the lookup must NOT use the mp engine:
    an engine-padded-but-replicated table would route to the non-mp
    sparse path whose infer_pack expects exact ceil(vocab/pack) rows
    (regression: trace-time ValueError).  Below the threshold the local
    packed path over the replicated table is the correct composition."""
    write_criteo_sample(str(tmp_path / "train"), num_lines=128, num_files=2,
                        vocab=10000)
    # default MIN_ROWS_TO_SHARD=8192 > ceil(10000/8)=1250 rows
    tr = Trainer(_sparse_cfg(tmp_path), mesh=create_mesh(2, 4))
    m = tr.train()
    assert np.isfinite(m["auc"])
    assert tr._mp_table_paths() == frozenset()
    tbl = tr.state.params["embedding"]["embedding"]
    assert tbl.shape[0] == 1250  # exact packed rows, no mp padding


def test_engine_external_overflow_drops_grads():
    """Bucket-overflow positions must contribute neither a forward
    vector nor a delta gradient (the non-external bwd_kernel drops the
    same positions) — the row-wise optimizer must never step a table row
    against a zero read."""
    from paddlerec_tpu.parallel.embedding import ShardedEmbedding

    mesh = create_mesh(2, 4)
    eng = ShardedEmbedding(mesh, vocab_size=4096, embedding_dim=9)
    table = eng.init(jax.random.PRNGKey(0))
    # all ids land on mp shard 0 (phys rows [0, 128)) with ~104 distinct
    # rows per device slice, far past the per-shard bucket capacity
    n = 64 * 13
    ids = jnp.asarray((np.arange(n) * 8 % 1024).reshape(64, 13))
    delta = jnp.full((n, 128), 0.5, jnp.float32)

    vecs_ref = eng.lookup(table, ids)  # dense path zeroes dropped rows
    vecs_ext, overflow = eng.lookup_external(table, delta, ids)
    assert int(jnp.sum(overflow)) > 0
    dropped = np.asarray(jnp.abs(vecs_ref).sum(-1) == 0).reshape(-1)
    assert dropped.any() and not dropped.all()
    # forward: dropped positions are zero even with a nonzero delta
    ext_norm = np.asarray(jnp.abs(vecs_ext).sum(-1)).reshape(-1)
    assert (ext_norm[dropped] == 0).all()
    assert (ext_norm[~dropped] > 0).all()

    def loss(d):
        v, _ = eng.lookup_external(table, d, ids)
        return jnp.sum(v * v)

    g = np.asarray(jnp.abs(jax.grad(loss)(delta)).sum(axis=1))
    assert (g[:n][dropped] == 0).all()
    assert (g[:n][~dropped] > 0).all()
