"""optimizer.runtime_inject: lr/embedding_l2 live in opt_state, so
sweeping them (Trainer.set_hyperparams) and re-initialising params
(Trainer.reset_state) reuse ONE compiled train step — the substrate for
hyperparameter tuning through the slow-compile tunnel
(tools_dev/quality_tune.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.train.trainer import Trainer


def _cfg(**over):
    d = {
        "runner.model": "rank.dnn",
        "runner.train_batch_size": 32,
        "runner.seed": 7,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.01,
        "hyper_parameters.optimizer.runtime_inject": True,
        "hyper_parameters.embedding_l2": 0.0,
        "hyper_parameters.sparse_inputs_slots": 5,
        "hyper_parameters.sparse_feature_number": 1000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.dense_input_dim": 4,
        "hyper_parameters.fc_sizes": [16],
    }
    d.update(over)
    return Config(d)


def _batch(t, bs=32, seed=0):
    rng = np.random.RandomState(seed)
    b = t.model_def.example_batch(bs)
    b = {k: jnp.asarray(v) for k, v in b.items()}
    if "label" in b:
        b["label"] = jnp.asarray(
            (rng.rand(*np.shape(b["label"])) < 0.4).astype(np.float32)
        )
    return b


def _step(t, batch):
    ms = t._init_metric_state()
    t.state, ms, loss = t._train_step(t.state, batch, ms)
    return float(loss)


def test_set_hyperparams_changes_lr_without_recompile():
    t = Trainer(_cfg())
    t.init_state()
    t._train_step = t._build_train_step()
    batch = _batch(t)
    p0 = jax.device_get(t.state.params)
    _step(t, batch)
    assert t._train_step._cache_size() == 1
    p_lr_hi = jax.device_get(t.state.params)

    # re-init, drop lr 100x, same compiled step must serve
    t.reset_state()
    t.set_hyperparams(learning_rate=1e-4)
    _step(t, batch)
    assert t._train_step._cache_size() == 1
    p_lr_lo = jax.device_get(t.state.params)

    def delta(a, b):
        return sum(
            float(np.abs(np.asarray(x, np.float32)
                         - np.asarray(y, np.float32)).sum())
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    assert delta(p0, p_lr_lo) < 0.1 * delta(p0, p_lr_hi)


def test_injected_el2_decays_embedding_rows():
    t = Trainer(_cfg())
    t.init_state()
    t._train_step = t._build_train_step()
    batch = _batch(t)

    def table_norm(params):
        from paddlerec_tpu.parallel.sharding import is_embedding_path

        tot = 0.0
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            if is_embedding_path(path):
                tot += float(
                    jnp.linalg.norm(jnp.asarray(leaf, jnp.float32))
                )
        return tot

    # decay term is -lr*el2*w: with lr tiny, Adam's moves are O(lr) but
    # lr*el2 with huge el2 still shrinks the tables measurably
    t.set_hyperparams(learning_rate=1e-6, embedding_l2=0.0)
    n0 = table_norm(t.state.params)
    _step(t, batch)
    assert np.isclose(table_norm(t.state.params), n0, rtol=1e-3)

    t.reset_state()
    t.set_hyperparams(learning_rate=1e-6, embedding_l2=1e5)
    _step(t, batch)  # shrink factor (1 - 1e-6*1e5) = 0.9
    shrunk = table_norm(t.state.params)
    assert 0.85 * n0 < shrunk < 0.95 * n0
    assert t._train_step._cache_size() == 1


def test_set_hyperparams_requires_inject():
    t = Trainer(_cfg(**{"hyper_parameters.optimizer.runtime_inject": False}))
    t.init_state()
    try:
        t.set_hyperparams(learning_rate=0.1)
    except ValueError as e:
        assert "runtime_inject" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_reset_state_keeps_tx_and_reinits_params():
    t = Trainer(_cfg())
    s1 = t.init_state()
    tx = s1.tx
    t._train_step = t._build_train_step()
    batch = _batch(t)
    _step(t, batch)
    s2 = t.reset_state(seed=11)
    assert s2.tx is tx
    assert int(jax.device_get(s2.step)) == 0
    _step(t, batch)
    assert t._train_step._cache_size() == 1
