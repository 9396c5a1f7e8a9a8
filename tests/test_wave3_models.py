"""word2vec / mind / textcnn / tagspace / match_pyramid / multiview_simnet."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import get_model_class


def cfg_of(name):
    base = {
        "hyper_parameters.optimizer.class": "adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    }
    extra = {
        "recall.word2vec": {
            "hyper_parameters.sparse_feature_number": 500,
            "hyper_parameters.sparse_feature_dim": 16,
            "hyper_parameters.neg_num": 3,
            "hyper_parameters.window_size": 3,
        },
        "recall.mind": {
            "hyper_parameters.item_count": 500,
            "hyper_parameters.embedding_dim": 16,
            "hyper_parameters.interest_num": 3,
            "hyper_parameters.neg_samples": 16,
            "hyper_parameters.maxlen": 8,
        },
        "contentunderstanding.textcnn": {
            "hyper_parameters.dict_dim": 500,
            "hyper_parameters.max_len": 20,
            "hyper_parameters.cnn_dim": 16,
            "hyper_parameters.emb_dim": 16,
            "hyper_parameters.hid_dim": 16,
        },
        "contentunderstanding.tagspace": {
            "hyper_parameters.vocab_text_size": 500,
            "hyper_parameters.vocab_tag_size": 4,
            "hyper_parameters.emb_dim": 8,
            "hyper_parameters.hid_dim": 32,
            "hyper_parameters.max_len": 12,
        },
        "match.match_pyramid": {
            "hyper_parameters.vocab_size": 500,
            "hyper_parameters.sentence_left_size": 10,
            "hyper_parameters.sentence_right_size": 40,
            "hyper_parameters.emb_size": 16,
        },
        "match.multiview_simnet": {
            "hyper_parameters.sparse_feature_number": 500,
            "hyper_parameters.embedding_dim": 16,
            "hyper_parameters.hidden_size": 16,
            "hyper_parameters.max_len": 6,
        },
    }[name]
    base.update(extra)
    return Config(base)


MODELS = [
    "recall.word2vec",
    "recall.mind",
    "contentunderstanding.textcnn",
    "contentunderstanding.tagspace",
    "match.match_pyramid",
    "match.multiview_simnet",
]


@pytest.mark.parametrize("name", MODELS)
def test_forward(name):
    md = get_model_class(name)(cfg_of(name))
    batch = jax.tree.map(jnp.asarray, md.example_batch(16))
    params = md.init_params(jax.random.PRNGKey(0))
    loss, aux = md.train_forward(params, batch)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("name", MODELS)
def test_learns(name):
    md = get_model_class(name)(cfg_of(name))
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
    assert last < first, f"{name}: {first} -> {last}"


def test_w2v_reader(tmp_path):
    p = tmp_path / "train"
    p.mkdir()
    with open(p / "part-0", "w") as f:
        f.write("1 2 3 4 5 6 7 8\n")
    md = get_model_class("recall.word2vec")(cfg_of("recall.word2vec"))
    batches = list(md.make_dataset(str(p), 4))
    assert batches, "no skip-gram pairs generated"
    b = batches[0]
    assert b["center"].shape == (4,)
    assert b["negs"].shape == (4, 3)


def test_mind_reader(tmp_path):
    p = tmp_path / "train"
    p.mkdir()
    with open(p / "part-0", "w") as f:
        for ts, item in enumerate([5, 9, 13, 17]):
            f.write(f"1,{item},{ts}\n")
    md = get_model_class("recall.mind")(cfg_of("recall.mind"))
    batches = list(md.make_dataset(str(p), 2))
    b = batches[0]
    # first sample: hist [5] → target 9
    assert b["hist_items"][0, 0] == 5
    assert b["target_items"][0] == 9
