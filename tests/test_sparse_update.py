"""Sparse row-wise embedding updates (ops/sparse_update.py)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_dedup_rows():
    from paddlerec_tpu.ops.sparse_update import dedup_rows

    phys = jnp.asarray([7, 3, 7, 0, 3, 3], jnp.int32)
    uniq, slot = dedup_rows(phys, num_rows=100)
    u = np.asarray(uniq)
    s = np.asarray(slot)
    # every original position maps back to its row
    np.testing.assert_array_equal(u[s], np.asarray(phys))
    # distinct rows appear once, padding is the sentinel
    assert sorted(set(u.tolist()) - {100}) == [0, 3, 7]
    assert (u == 100).sum() == 3


def test_rowwise_adam_matches_dense_adam_on_touched_rows():
    import optax

    from paddlerec_tpu.ops.sparse_update import (
        dedup_rows, rowwise_adam, rowwise_adam_init,
    )

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(50, 128).astype(np.float32))
    dense_grad = np.zeros((50, 128), np.float32)
    touched = np.asarray([4, 9, 30])
    dense_grad[touched] = rng.randn(3, 128)

    # dense reference: optax adam, step 1
    tx = optax.adam(0.1)
    upd, _ = tx.update(jnp.asarray(dense_grad), tx.init(table), table)
    dense_new = np.asarray(table + upd)

    phys = jnp.asarray([4, 9, 30, 9], jnp.int32)  # 9 duplicated
    g = np.zeros((4, 128), np.float32)
    g[0] = dense_grad[4]
    g[1] = dense_grad[9] * 0.25
    g[2] = dense_grad[30]
    g[3] = dense_grad[9] * 0.75  # duplicates sum to the dense grad
    uniq, slot = dedup_rows(phys, 50)
    g_uniq = jnp.zeros((4, 128)).at[slot].add(jnp.asarray(g))
    new_table, st = rowwise_adam(
        table, rowwise_adam_init(table), uniq, g_uniq, lr=0.1
    )
    new_table = np.asarray(new_table)
    np.testing.assert_allclose(new_table[touched], dense_new[touched],
                               rtol=1e-5)
    # untouched rows bit-identical (no traffic)
    untouched = np.setdiff1d(np.arange(50), touched)
    np.testing.assert_array_equal(new_table[untouched],
                                  np.asarray(table)[untouched])
    assert int(st.count[9]) == 1 and int(st.count[0]) == 0


def test_external_lookup_matches_packed_and_taps_grads():
    import flax.linen as nn

    from paddlerec_tpu.ops.embedding import SlotEmbedding
    from paddlerec_tpu.ops.packed_embedding import packed_shape, sub_width
    from paddlerec_tpu.ops.sparse_update import (
        apply_sparse_update, find_sparse_taps, get_path, rowwise_adam_init,
    )

    vocab, dim = 1000, 9
    ids = jnp.asarray(np.random.RandomState(0).randint(0, vocab, (8, 4)))

    dense_mod = SlotEmbedding(vocab, dim, init_stddev=0.1)
    ext_mod = SlotEmbedding(vocab, dim, init_stddev=0.1,
                            external_update=True, delta_capacity=32)
    dvars = dense_mod.init(jax.random.PRNGKey(1), ids)
    evars = ext_mod.init(jax.random.PRNGKey(1), ids)
    # same table init (same rng path), same forward values
    np.testing.assert_allclose(
        np.asarray(dense_mod.apply(dvars, ids)),
        np.asarray(ext_mod.apply(evars, ids)), rtol=1e-6,
    )

    def loss_e(p):
        return (ext_mod.apply({"params": p}, ids) ** 2).sum()

    def loss_d(p):
        return (dense_mod.apply({"params": p}, ids) ** 2).sum()

    ge = jax.grad(loss_e)(evars["params"])
    gd = jax.grad(loss_d)(dvars["params"])
    taps = find_sparse_taps(evars["params"])
    assert len(taps) == 1
    (dpath, tpath), = taps.items()
    # table itself receives NO grad in external mode
    assert float(jnp.abs(get_path(ge, tpath)).max()) == 0.0

    # applying the delta grads row-wise == adam on the dense grad table
    import optax

    table = get_path(evars["params"], tpath)
    pack = 128 // sub_width(dim)
    phys = (ids.reshape(-1) // pack).astype(jnp.int32)
    new_table, _ = apply_sparse_update(
        table, rowwise_adam_init(table), get_path(ge, dpath), phys, lr=0.05
    )
    tx = optax.adam(0.05)
    dtable = get_path(dvars["params"], tpath)
    upd, _ = tx.update(get_path(gd, tpath), tx.init(dtable), dtable)
    rows = np.unique(np.asarray(phys))
    np.testing.assert_allclose(
        np.asarray(new_table)[rows],
        np.asarray(dtable + upd)[rows], rtol=1e-4, atol=1e-6,
    )
    untouched = np.setdiff1d(np.arange(packed_shape(vocab, dim)[0]), rows)
    np.testing.assert_array_equal(
        np.asarray(new_table)[untouched], np.asarray(table)[untouched]
    )


def test_trainer_sparse_update_e2e(tmp_path):
    """rank.dnn with hyper_parameters.sparse_update: the delta-tapped
    table learns (AUC well above chance on planted-signal data), the
    dense optimizer never touches it, and checkpoints round-trip the
    row-wise moments."""
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.data.synthetic import write_criteo_sample
    from paddlerec_tpu.train.trainer import Trainer

    data = str(tmp_path / "train")
    write_criteo_sample(data, num_lines=2000, num_files=1, vocab=5000)
    flat = {
        "runner.model": "rank.dnn",
        "runner.train_data_dir": data,
        "runner.test_data_dir": data,
        "runner.train_batch_size": 128,
        "runner.epochs": 2,
        "runner.print_interval": 100,
        "runner.model_save_path": str(tmp_path / "out"),
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.sparse_feature_number": 5000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.fc_sizes": [32, 16],
        "hyper_parameters.sparse_update": True,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.01,
    }
    trainer = Trainer(Config(dict(flat)))
    metrics = trainer.train()
    assert metrics["auc"] > 0.75, metrics
    assert trainer.state.extra is not None and len(trainer.state.extra) == 1
    (st,) = trainer.state.extra.values()
    assert float(jnp.abs(st.m).max()) > 0  # moments actually advanced
    # the delta param stayed zero (it is only a grad tap)
    from paddlerec_tpu.ops.sparse_update import find_sparse_taps, get_path

    taps = find_sparse_taps(trainer.state.params)
    (dpath,) = taps.keys()
    assert float(jnp.abs(get_path(trainer.state.params, dpath)).max()) == 0.0

    # resume from checkpoint restores extra and keeps training
    t2 = Trainer(Config(dict(flat)))
    t2.init_state()
    t2.load_checkpoint(str(tmp_path / "out"), 1)
    (st2,) = t2.state.extra.values()
    np.testing.assert_allclose(np.asarray(st2.m), np.asarray(st.m))
    assert t2.evaluate()["auc"] > 0.75


def test_sparse_vs_dense_parity_small():
    """One jitted step of the sparse trainer path == dense Adam applied
    to the same model, for the rows the batch touched."""
    import optax

    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.core.registry import get_model_class
    from paddlerec_tpu.ops.sparse_update import (
        find_sparse_taps, get_path,
    )

    base = {
        "runner.model": "rank.dnn",
        "runner.train_batch_size": 16,
        "hyper_parameters.sparse_inputs_slots": 5,
        "hyper_parameters.dense_input_dim": 4,
        "hyper_parameters.sparse_feature_number": 400,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.fc_sizes": [16],
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.05,
    }
    dense_md = get_model_class("rank.dnn")(Config(dict(base)))
    sparse_md = get_model_class("rank.dnn")(
        Config(dict(base, **{"hyper_parameters.sparse_update": True}))
    )
    batch = jax.tree.map(jnp.asarray, dense_md.example_batch(16))

    dp = dense_md.init_with_batch(jax.random.PRNGKey(3), batch)
    sp = sparse_md.init_with_batch(jax.random.PRNGKey(3), batch)
    taps = find_sparse_taps(sp)
    (dpath, tpath), = taps.items()
    np.testing.assert_allclose(
        np.asarray(get_path(dp, tpath)), np.asarray(get_path(sp, tpath))
    )

    # dense step
    (_, _), gd = jax.value_and_grad(
        lambda p: dense_md.train_forward(p, batch), has_aux=True
    )(dp)
    tx = optax.adam(0.05)
    upd, _ = tx.update(gd, tx.init(dp), dp)
    dense_table = np.asarray(get_path(optax.apply_updates(dp, upd), tpath))

    # sparse step (optimizer freezes the table; row-wise adam moves it)
    (_, _), gs = jax.value_and_grad(
        lambda p: sparse_md.train_forward(p, batch), has_aux=True
    )(sp)
    extra = sparse_md.init_sparse_state(sp)
    new_sp, _ = sparse_md.apply_sparse_updates(sp, extra, gs, batch)
    sparse_table = np.asarray(get_path(new_sp, tpath))

    pack = 128 // 8  # dim 8 -> w 8
    rows = np.unique(np.asarray(batch["sparse"]).reshape(-1) % 400 // pack)
    np.testing.assert_allclose(sparse_table[rows], dense_table[rows],
                               rtol=2e-4, atol=1e-6)
    untouched = np.setdiff1d(np.arange(sparse_table.shape[0]), rows)
    np.testing.assert_array_equal(
        sparse_table[untouched], np.asarray(get_path(sp, tpath))[untouched]
    )


def test_compact_update_matches_scratch_update():
    """Host-deduped compact path == dense-scratch path, both rules."""
    from paddlerec_tpu.ops.sparse_update import (
        RowwiseAdagradState, apply_sparse_adagrad,
        apply_sparse_adagrad_compact, apply_sparse_adam_compact,
        apply_sparse_update, host_dedup, rowwise_adagrad_init,
        rowwise_adam_init,
    )

    rng = np.random.RandomState(1)
    R = 200
    table = jnp.asarray(rng.randn(R, 128).astype(np.float32))
    ids = rng.randint(0, R * 4, 96)  # vocab = 4R, pack 4
    delta = jnp.asarray(rng.randn(96, 128).astype(np.float32))
    phys = jnp.asarray((ids % (R * 4)) // 4, jnp.int32)
    uniq, slot = host_dedup(ids, R * 4, 4)

    a1, s1 = apply_sparse_adagrad(
        table, rowwise_adagrad_init(table), delta, phys, lr=0.1
    )
    a2, s2 = apply_sparse_adagrad_compact(
        table, rowwise_adagrad_init(table), delta,
        jnp.asarray(uniq), jnp.asarray(slot), lr=0.1,
    )
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.acc), np.asarray(s2.acc),
                               rtol=1e-5)

    m1, t1 = apply_sparse_update(
        table, rowwise_adam_init(table), delta, phys, lr=0.1
    )
    m2, t2 = apply_sparse_adam_compact(
        table, rowwise_adam_init(table), delta,
        jnp.asarray(uniq), jnp.asarray(slot), lr=0.1,
    )
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(t1.count), np.asarray(t2.count))


def test_deepfm_wide_deep_sparse_wiring():
    """deepfm/wide_deep expose the same sparse_update switch as dnn."""
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.core.registry import get_model_class
    from paddlerec_tpu.ops.sparse_update import find_sparse_taps

    for name in ("rank.deepfm", "rank.wide_deep"):
        md = get_model_class(name)(Config({
            "runner.model": name,
            "runner.train_batch_size": 8,
            "runner.infer_batch_size": 8,
            "hyper_parameters.sparse_inputs_slots": 5,
            "hyper_parameters.dense_input_dim": 4,
            "hyper_parameters.sparse_feature_number": 300,
            "hyper_parameters.sparse_feature_dim": 8,
            "hyper_parameters.fc_sizes": [16],
            "hyper_parameters.sparse_update": True,
        }))
        batch = jax.tree.map(jnp.asarray, md.example_batch(8))
        params = md.init_with_batch(jax.random.PRNGKey(0), batch)
        taps = find_sparse_taps(params)
        assert len(taps) == 1, (name, taps)
        extra = md.init_sparse_state(params)
        (_, _), g = jax.value_and_grad(
            lambda p: md.train_forward(p, batch), has_aux=True
        )(params)
        batch = md.augment_batch_host(batch)
        new_params, new_extra = md.apply_sparse_updates(
            params, extra, g, batch
        )
        # the table moved, under either rule
        (dpath, tpath), = taps.items()
        from paddlerec_tpu.ops.sparse_update import get_path

        assert not np.allclose(
            np.asarray(get_path(new_params, tpath)),
            np.asarray(get_path(params, tpath)),
        )


def test_bf16_table_learns(tmp_path):
    """sparse_feature_dtype: bfloat16 — half the table traffic at AUC
    parity (the headline bench runs this configuration)."""
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.data.synthetic import write_criteo_sample
    from paddlerec_tpu.train.trainer import Trainer

    data = str(tmp_path / "train")
    write_criteo_sample(data, num_lines=2000, num_files=1, vocab=3000)
    cfg = Config({
        "runner.model": "rank.deepfm",
        "runner.train_data_dir": data,
        "runner.test_data_dir": data,
        "runner.train_batch_size": 256,
        "runner.epochs": 3,
        "runner.print_interval": 1000,
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.sparse_feature_number": 3000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.fc_sizes": [32, 16],
        "hyper_parameters.sparse_feature_dtype": "bfloat16",
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.005,
    })
    trainer = Trainer(cfg)
    metrics = trainer.train()
    assert metrics["auc"] > 0.9, metrics
    table = trainer.state.params["embedding"]["embedding"]
    assert table.dtype == jnp.bfloat16


def test_stochastic_rounding_accumulates_tiny_updates():
    """bf16 + stochastic rounding: many sub-resolution updates must move
    the stored value in expectation; round-to-nearest freezes it."""
    from paddlerec_tpu.ops.sparse_update import stochastic_round_bf16

    x = jnp.full((4096,), 1.0, jnp.float32)
    tiny = 1e-4  # far below bf16 resolution at 1.0 (~0.0078)
    # round-to-nearest: value never moves
    rtn = jnp.asarray(x + tiny).astype(jnp.bfloat16)
    assert float(jnp.abs(rtn.astype(jnp.float32) - 1.0).max()) == 0.0
    # stochastic: mean of the stored values ≈ the true value
    sr = stochastic_round_bf16(x + tiny, jax.random.PRNGKey(0))
    mean = float(sr.astype(jnp.float32).mean())
    assert abs(mean - (1.0 + tiny)) < 3e-5, mean
    # simulated long run: accumulate 500 tiny steps through bf16 storage
    stored = jnp.full((4096,), 1.0, jnp.bfloat16)
    key = jax.random.PRNGKey(1)
    for i in range(500):
        key, k = jax.random.split(key)
        stored = stochastic_round_bf16(
            stored.astype(jnp.float32) + tiny, k
        )
    drift = float(stored.astype(jnp.float32).mean()) - 1.0
    assert abs(drift - 500 * tiny) < 0.01, drift  # ≈ 0.05 accumulated


def test_sparse_update_via_context_across_ctr_zoo():
    """CTRModelDef's trace-time context gives EVERY SlotEmbedding-based
    CTR model sparse_update + bf16 tables from config alone."""
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.core.registry import get_model_class
    from paddlerec_tpu.ops.sparse_update import find_sparse_taps, get_path

    for name in ("rank.fm", "rank.dcn_v2", "rank.xdeepfm", "rank.autoint"):
        md = get_model_class(name)(Config({
            "runner.model": name,
            "runner.train_batch_size": 8,
            "runner.infer_batch_size": 8,
            "hyper_parameters.sparse_inputs_slots": 5,
            "hyper_parameters.dense_input_dim": 4,
            "hyper_parameters.sparse_feature_number": 300,
            "hyper_parameters.sparse_feature_dim": 8,
            "hyper_parameters.fc_sizes": [16],
            "hyper_parameters.sparse_update": True,
            "hyper_parameters.sparse_feature_dtype": "bfloat16",
        }))
        batch = jax.tree.map(jnp.asarray, md.example_batch(8))
        params = md.init_with_batch(jax.random.PRNGKey(0), batch)
        taps = find_sparse_taps(params)
        assert len(taps) == 1, name
        (dpath, tpath), = taps.items()
        assert get_path(params, tpath).dtype == jnp.bfloat16, name
        extra = md.init_sparse_state(params)
        (_, _), g = jax.value_and_grad(
            lambda p: md.train_forward(p, batch), has_aux=True
        )(params)
        # table grad is zero (tap routes it), delta grad is not
        assert float(jnp.abs(get_path(g, tpath).astype(jnp.float32)).max()) == 0.0, name
        assert float(jnp.abs(get_path(g, dpath)).max()) > 0.0, name
        new_params, _ = md.apply_sparse_updates(
            params, extra, g, md.augment_batch_host(batch)
        )
        assert not jnp.array_equal(
            get_path(new_params, tpath), get_path(params, tpath)
        ), name


def test_export_strips_delta_and_runs_plain_lookup(tmp_path):
    """Exporting a sparse_update-trained model drops the zero delta
    param (100MB+ at production capacity) and flips the artifact to the
    plain lookup path — forwards are numerically identical."""
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.data.synthetic import write_criteo_sample
    from paddlerec_tpu.tools.export import export_model, load_exported
    from paddlerec_tpu.train.trainer import Trainer

    data = str(tmp_path / "train")
    write_criteo_sample(data, num_lines=300, num_files=1, vocab=2000)
    flat = {
        "runner.model": "rank.dnn",
        "runner.train_data_dir": data,
        "runner.test_data_dir": data,
        "runner.train_batch_size": 64,
        "runner.epochs": 1,
        "runner.print_interval": 100,
        "runner.model_save_path": str(tmp_path / "out"),
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.sparse_feature_number": 2000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.fc_sizes": [16],
        "hyper_parameters.sparse_update": True,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.01,
    }
    trainer = Trainer(Config(dict(flat)))
    trainer.train()
    cfg = Config(dict(flat,
                      **{"runner.model_init_path": str(tmp_path / "out/0")}))
    export_model(cfg, str(tmp_path / "export"))
    md, params = load_exported(str(tmp_path / "export"))
    paths = {"/".join(str(k.key) for k in p)
             for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert not any("embedding_delta" in p for p in paths)
    assert not md.sparse_update_enabled()
    # forward parity: artifact output == training-model output
    batch = jax.tree.map(jnp.asarray, md.example_batch(32))
    art = md.infer_forward(params, batch)["predictions"]
    train_out = trainer.model_def.infer_forward(
        trainer.state.params, batch
    )["predictions"]
    np.testing.assert_allclose(np.asarray(art), np.asarray(train_out),
                               rtol=1e-5)


def test_lazy_adam_skips_zero_grad_rows():
    """A row whose summed grad is exactly zero (e.g. a host-table
    overflow row whose grads the fetch path zeroed) must take NO step:
    a zero-grad Adam step still moves the table (momentum decay + bias
    correction) and mutates m/v/count (round-3 advisor finding)."""
    import jax.numpy as jnp
    import numpy as np

    from paddlerec_tpu.ops.sparse_update import (
        SENTINEL, apply_sparse_adam_compact, apply_sparse_update,
        rowwise_adam_init,
    )

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(32, 128).astype(np.float32))
    state = rowwise_adam_init(table)
    # seed momentum so a zero-grad step would visibly move the table
    state = state._replace(
        m=state.m.at[:].set(0.5),
        v=state.v.at[:].set(0.25),
        count=state.count.at[:].set(3),
    )
    # positions: rows 2 (real grad) and 7 (zeroed grad)
    uniq = np.full(4, SENTINEL, np.int32)
    uniq[:2] = [2, 7]
    slot = np.array([0, 1, 1, 1], np.int32)
    delta = np.zeros((4, 128), np.float32)
    delta[0] = 0.1  # row 2 gets grad; rows mapping to uniq[1]=7 stay 0
    t2, s2 = apply_sparse_adam_compact(
        table, state, jnp.asarray(delta), jnp.asarray(uniq),
        jnp.asarray(slot), lr=0.01,
    )
    assert not np.allclose(np.asarray(t2[2]), np.asarray(table[2]))
    np.testing.assert_array_equal(np.asarray(t2[7]), np.asarray(table[7]))
    np.testing.assert_array_equal(np.asarray(s2.m[7]), 0.5)
    np.testing.assert_array_equal(np.asarray(s2.count[7]), 3)
    assert int(s2.count[2]) == 4

    # positional variant: same contract
    phys = np.array([2, 7], np.int32)
    d2 = np.zeros((2, 128), np.float32)
    d2[0] = 0.1
    t3, s3 = apply_sparse_update(
        table, state, jnp.asarray(d2), jnp.asarray(phys), lr=0.01,
    )
    np.testing.assert_array_equal(np.asarray(t3[7]), np.asarray(table[7]))
    np.testing.assert_array_equal(np.asarray(s3.m[7]), 0.5)
    assert not np.allclose(np.asarray(t3[2]), np.asarray(table[2]))
