"""Lazy Adam: untouched rows stay untouched (the reference's
Adam(lazy_mode=True) semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import get_model_class
from paddlerec_tpu.train.optimizers import lazy_adam


def test_untouched_rows_frozen():
    tx = lazy_adam(0.1)
    params = {"t": jnp.ones((6, 4))}
    st = tx.init(params)
    g = {"t": jnp.zeros((6, 4)).at[2].set(1.0).at[4].set(-1.0)}
    upd, st = tx.update(g, st, params)
    p = optax.apply_updates(params, upd)
    touched = np.asarray(p["t"])
    assert np.allclose(touched[[0, 1, 3, 5]], 1.0)  # frozen
    assert not np.allclose(touched[2], 1.0)
    assert not np.allclose(touched[4], 1.0)
    # moments of untouched rows stay zero (no decay drift)
    assert np.allclose(np.asarray(st.mu["t"])[[0, 1, 3, 5]], 0.0)


def test_matches_dense_adam_when_all_rows_touched():
    lazy = lazy_adam(0.01)
    dense = optax.adam(0.01)
    params = {"t": jnp.ones((4, 3))}
    sl, sd = lazy.init(params), dense.init(params)
    rng = np.random.RandomState(0)
    pl_, pd_ = params, params
    for _ in range(5):
        g = {"t": jnp.asarray(rng.randn(4, 3).astype("f"))}
        ul, sl = lazy.update(g, sl, pl_)
        ud, sd = dense.update(g, sd, pd_)
        pl_ = optax.apply_updates(pl_, ul)
        pd_ = optax.apply_updates(pd_, ud)
    np.testing.assert_allclose(
        np.asarray(pl_["t"]), np.asarray(pd_["t"]), rtol=1e-5
    )


def test_lazy_mode_config_wires_multi_transform():
    cfg = Config({
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
        "hyper_parameters.optimizer.lazy_mode": True,
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.sparse_feature_number": 100000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.fc_sizes": [16],
    })
    md = get_model_class("rank.dnn")(cfg)
    params = md.init_params(jax.random.PRNGKey(0))
    tx = md.create_optimizer()
    opt = tx.init(params)
    batch = jax.tree.map(jnp.asarray, md.example_batch(8))

    @jax.jit
    def step(params, opt):
        (loss, _), g = jax.value_and_grad(md.train_forward, has_aux=True)(
            params, batch
        )
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    p0 = jax.device_get(params)
    params, opt, loss = step(params, opt)
    assert np.isfinite(float(loss))
    # most table rows untouched by an 8-example batch → unchanged
    table_after = np.asarray(
        jax.device_get(params)["embedding"]["embedding"]
    )
    table_before = np.asarray(p0["embedding"]["embedding"])
    unchanged = np.all(table_after == table_before, axis=1).mean()
    assert unchanged > 0.9, f"only {unchanged:.2%} rows frozen"
