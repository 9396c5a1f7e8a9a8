"""DIN / DSSM / NCF: forward, learning, readers."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import get_model_class


def din_cfg():
    return Config({
        "hyper_parameters.item_count": 1000,
        "hyper_parameters.cat_count": 50,
        "hyper_parameters.item_emb_size": 16,
        "hyper_parameters.cat_emb_size": 16,
        "hyper_parameters.max_seq_len": 16,
        "hyper_parameters.optimizer.class": "adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    })


def bst_cfg():
    c = din_cfg().copy()
    c["hyper_parameters.n_head"] = 2
    c["hyper_parameters.ffn_dim"] = 32
    c["hyper_parameters.fc_sizes"] = [32, 16]
    return c


def dien_cfg():
    c = din_cfg().copy()
    c["hyper_parameters.gru_hidden"] = 16
    c["hyper_parameters.fc_sizes"] = [32, 16]
    return c


def dssm_cfg():
    return Config({
        "hyper_parameters.trigram_d": 128,
        "hyper_parameters.neg_num": 2,
        "hyper_parameters.fc_sizes": [64, 32],
        "hyper_parameters.optimizer.class": "adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    })


def ncf_cfg():
    return Config({
        "hyper_parameters.num_users": 100,
        "hyper_parameters.num_items": 80,
        "hyper_parameters.mf_dim": 8,
        "hyper_parameters.fc_layers": [32, 16, 8],
        "hyper_parameters.mode": "NCF_NeuMF",
        "hyper_parameters.optimizer.class": "adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    })


CASES = [
    ("rank.din", din_cfg),
    ("rank.bst", bst_cfg),
    ("rank.dien", dien_cfg),
    ("match.dssm", dssm_cfg),
    ("recall.ncf", ncf_cfg),
]


@pytest.mark.parametrize("name,cfg_fn", CASES)
def test_forward(name, cfg_fn):
    md = get_model_class(name)(cfg_fn())
    batch = jax.tree.map(jnp.asarray, md.example_batch(16))
    params = md.init_params(jax.random.PRNGKey(0))
    loss, aux = md.train_forward(params, batch)
    assert np.isfinite(float(loss))
    for _, (p, l, m) in md.metric_updates(aux).items():
        assert ((np.asarray(p) >= 0) & (np.asarray(p) <= 1)).all()


@pytest.mark.parametrize("name,cfg_fn", CASES)
def test_learns(name, cfg_fn):
    md = get_model_class(name)(cfg_fn())
    batch = jax.tree.map(jnp.asarray, md.example_batch(32))
    params = md.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(0.01)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, _), g = jax.value_and_grad(md.train_forward, has_aux=True)(
            params, batch
        )
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for _ in range(40):
        params, opt, loss = step(params, opt)
        first = float(loss) if first is None else first
        last = float(loss)
    assert last < first * 0.95, f"{name}: {first} -> {last}"


def test_din_reader(tmp_path):
    p = tmp_path / "train"
    p.mkdir()
    with open(p / "part-0", "w") as f:
        f.write("1 2 3;4 5 6;7;8;1\n")
        f.write("9;10;11;12;0\n")
    md = get_model_class("rank.din")(din_cfg())
    batches = list(md.make_dataset(str(p), 2))
    b = batches[0]
    np.testing.assert_array_equal(b["hist_item"][0, :3], [1, 2, 3])
    assert b["seq_mask"][0].sum() == 3
    assert b["seq_mask"][1].sum() == 1
    assert b["target_item"][1] == 11
    assert b["label"][0] == 1.0


def test_dssm_reader(tmp_path):
    p = tmp_path / "train"
    p.mkdir()
    d = 128
    vec = ",".join(["0"] * (d - 1) + ["1"])
    with open(p / "part-0", "w") as f:
        f.write("\t".join([vec, vec, vec, vec]) + "\n")
    md = get_model_class("match.dssm")(dssm_cfg())
    batches = list(md.make_dataset(str(p), 1))
    b = batches[0]
    assert b["query"].shape == (1, d)
    assert b["doc_negs"].shape == (1, 2, d)
    assert b["query"][0, -1] == 1.0


def test_ncf_reader(tmp_path):
    p = tmp_path / "train"
    p.mkdir()
    with open(p / "part-0", "w") as f:
        f.write("1,2,1\n3,4,0\n5,6,1\n")
    md = get_model_class("recall.ncf")(ncf_cfg())
    batches = list(md.make_dataset(str(p), 2))
    assert len(batches) == 2
    assert batches[1]["mask"].sum() == 1
