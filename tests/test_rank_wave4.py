"""Rank wave 4: dsin, dmr, autofis (GRDA), deeprec, dpin, sign, news models,
bert4rec, iprec."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import get_model_class

SMALL = {
    "rank.dsin": {
        "hyper_parameters.user_size": 1000, "hyper_parameters.adgroup_size": 1000,
        "hyper_parameters.campaign_size": 1000, "hyper_parameters.customer_size": 1000,
        "hyper_parameters.cate_size": 500, "hyper_parameters.brand_size": 500,
    },
    "rank.dmr": {
        "hyper_parameters.user_size": 1000, "hyper_parameters.adgroup_id_size": 1000,
        "hyper_parameters.campaign_id_size": 1000, "hyper_parameters.customer_size": 1000,
        "hyper_parameters.cate_size": 300, "hyper_parameters.brand_size": 300,
        "hyper_parameters.history_length": 10,
    },
    "rank.autofis": {
        "hyper_parameters.num_inputs": 8, "hyper_parameters.input_size": 5000,
        "hyper_parameters.embedding_size": 8, "hyper_parameters.width": 32,
        "hyper_parameters.depth": 2,
    },
    "rank.deeprec": {"hyper_parameters.layer_sizes": [200, 64, 32]},
    "rank.dpin": {
        "hyper_parameters.K": 5, "hyper_parameters.L": 4,
        "hyper_parameters.max_item": 1000, "hyper_parameters.max_context": 500,
        "hyper_parameters.emb_dim": 8, "hyper_parameters.d_model": 16,
        "hyper_parameters.num_blocks": 2,
    },
    "rank.sign": {
        "hyper_parameters.n_feature": 500, "hyper_parameters.num_nodes": 4,
    },
    "rank.naml": {},
    "rank.fastformer": {
        "hyper_parameters.num_attention_heads": 4,
        "hyper_parameters.num_hidden_layers": 1,
    },
    "rank.bert4rec": {
        "hyper_parameters._voc_size": 500,
        "hyper_parameters._max_position_seq_len": 20,
    },
    "rank.iprec": {
        "hyper_parameters.num_users": 500, "hyper_parameters.num_items": 400,
        "hyper_parameters.num_bizs": 300, "hyper_parameters.hidden_units": 16,
        "hyper_parameters.f_max_len": 5, "hyper_parameters.u_max_i": 6,
        "hyper_parameters.u_max_f": 7, "hyper_parameters.u_max_pack": 4,
        "hyper_parameters.pack_max_nei_b": 3, "hyper_parameters.pack_max_nei_f": 3,
    },
}


def make(name):
    cfg = Config({
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
        **SMALL[name],
    })
    return get_model_class(name)(cfg)


@pytest.mark.parametrize("name", sorted(SMALL))
def test_forward(name):
    md = make(name)
    params = md.init_params(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, md.example_batch(4))
    kwargs = (
        {"rng": jax.random.PRNGKey(1)}
        if getattr(md, "stochastic", False)
        else {}
    )
    loss, aux = md.train_forward(params, batch, **kwargs)
    assert np.isfinite(float(loss))
    if md.metrics == "auc":
        for _n, (p, l, m) in md.metric_updates(aux).items():
            assert np.all(np.asarray(p) >= 0) and np.all(np.asarray(p) <= 1)


@pytest.mark.parametrize("name", ["rank.dsin", "rank.dmr", "rank.iprec",
                                  "rank.naml", "rank.bert4rec"])
def test_learns(name):
    md = make(name)
    batch = jax.tree.map(jnp.asarray, md.example_batch(16))
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
    for _ in range(30):
        params, opt, loss = step(params, opt)
        first = float(loss) if first is None else first
        last = float(loss)
    assert last < first * 0.97, f"{name}: {first} -> {last}"


def test_autofis_grda_sparsifies_gate():
    """The search-stage GRDA optimizer must drive some interaction gates
    exactly to zero (that is its entire purpose)."""
    cfg = Config({
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.01,
        # aggressive L1 growth so gates hit zero within the test budget
        # (production search runs epochs with grad_c=5e-4)
        "hyper_parameters.grad_c": 10.0,
        "hyper_parameters.grad_mu": 0.8,
        **SMALL["rank.autofis"],
    })
    md = get_model_class("rank.autofis")(cfg)
    assert md.stage == 0
    batch = jax.tree.map(jnp.asarray, md.example_batch(32))
    params = md.init_params(jax.random.PRNGKey(0))
    tx = md.create_optimizer()
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, _), g = jax.value_and_grad(md.train_forward, has_aux=True)(
            params, batch
        )
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(60):
        params, opt, loss = step(params, opt)
    gate = np.asarray(params["interaction_mask"])
    assert np.isfinite(float(loss))
    # GRDA's growing soft-threshold must have driven gates exactly to zero
    # (on synthetic data gradients don't differentiate pairs, so all may die)
    assert np.sum(gate == 0.0) > 0, f"no gate reached zero: {gate}"
    assert len(md.selected_pairs(params)) == int(np.sum(gate != 0.0))

    # stage 1 retrains only the kept pairs
    kept = [0, 3, 7, 11]
    cfg = Config({
        "stage": 1,
        "hyper_parameters.comb_mask": kept,
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
        **SMALL["rank.autofis"],
    })
    md2 = get_model_class("rank.autofis")(cfg)
    p2 = md2.init_params(jax.random.PRNGKey(0))
    assert p2["interaction_mask"].shape == (len(kept),)
    batch = jax.tree.map(jnp.asarray, md2.example_batch(4))
    loss2, _ = md2.train_forward(p2, batch)
    assert np.isfinite(float(loss2))


def test_sign_l0_gates_are_stochastic_in_train():
    md = make("rank.sign")
    params = md.init_params(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, md.example_batch(8))
    l1, _ = md.train_forward(params, batch, rng=jax.random.PRNGKey(1))
    l2, _ = md.train_forward(params, batch, rng=jax.random.PRNGKey(2))
    l3, _ = md.train_forward(params, batch, rng=None)  # deterministic
    l3b, _ = md.train_forward(params, batch, rng=None)
    assert float(l1) != float(l2)
    assert float(l3) == float(l3b)


def test_bert4rec_cloze_dataset(tmp_path):
    data = tmp_path / "train"
    data.mkdir()
    rng = np.random.RandomState(0)
    with open(data / "part-0", "w") as f:
        for u in range(20):
            seq = rng.randint(1, 400, rng.randint(3, 15))
            f.write(f"{u} " + " ".join(map(str, seq)) + "\n")
    md = make("rank.bert4rec")
    batches = list(md.make_dataset(str(data), 8))
    b = batches[0]
    assert b["src_ids"].shape == (8, 20)
    mask_id = md.voc_size - 1
    # masked positions actually hold the [MASK] token and true labels differ
    for i in range(8):
        k = int(b["mask_weight"][i].sum())
        assert k >= 1
        pos = b["mask_pos"][i, :k]
        assert np.all(b["src_ids"][i, pos] == mask_id)


def test_dmr_aux_loss_positive():
    md = make("rank.dmr")
    params = md.init_params(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, md.example_batch(4))
    logits, aux_loss = md.module.apply(
        {"params": params}, *md.model_inputs(batch)
    )
    assert float(aux_loss) > 0  # 0.1 · softmax CE over cate vocab
    assert logits.shape == (4,)


def test_deeprec_masked_mse_ignores_unobserved():
    md = make("rank.deeprec")
    params = md.init_params(jax.random.PRNGKey(0))
    batch = md.example_batch(4)
    # zero out everything → loss must treat denominator safely
    batch0 = {"ratings": np.zeros_like(batch["ratings"])}
    loss0, _ = md.train_forward(params, jax.tree.map(jnp.asarray, batch0))
    assert np.isfinite(float(loss0))


def test_dmr_dataset_iterates_text_files(tmp_path):
    """Regression: _batch built its mask from an undefined ``valid``
    (shadowed by a duplicate dict key), so DMRDataset crashed on any
    real file — example_batch never exercised the reader path."""
    from paddlerec_tpu.models.rank.dmr.model import DMRDataset
    md = make("rank.dmr")
    v = md.vocab
    T = 10
    rng = np.random.RandomState(0)
    scalar_vocabs = (
        [v["user"]] + [v[n] for n in (
            "cms_segid", "cms_group_id", "final_gender_code", "age_level",
            "pvalue_level", "shopping_level", "occupation",
            "new_user_class_level")]
        + [v["adgroup_id"], v["cate"], v["campaign_id"], v["customer"],
           v["brand"], 10, v["pid"]]  # col 14 is the float price
    )
    rows = []
    for _ in range(5):
        hist = (rng.randint(0, v["btag"], T).tolist()
                + rng.randint(0, v["cate"], T).tolist()
                + rng.randint(0, v["brand"], T).tolist())
        masks = [1] * T + [0] * T  # all-zero match_mask must be safe
        scalars = [rng.randint(0, s) for s in scalar_vocabs]
        rows.append(",".join(map(str, hist + masks + scalars + [1])))
    f = tmp_path / "part-0.txt"
    f.write_text("\n".join(rows) + "\n")
    ds = DMRDataset([str(f)], 2, T)
    batches = list(ds)
    # tail batch zero-pads to the full size; mask marks the real row
    assert [len(b["label"]) for b in batches] == [2, 2, 2]
    assert batches[-1]["mask"].tolist() == [1.0, 0.0]
    params = md.init_params(jax.random.PRNGKey(0))
    loss, aux = md.train_forward(
        params, jax.tree.map(jnp.asarray, batches[0]))
    assert np.isfinite(float(loss))


def test_dsin_dataset_iterates_text_files(tmp_path):
    from paddlerec_tpu.models.rank.dsin.model import DSINDataset
    S, L = 5, 10
    rng = np.random.RandomState(0)
    lines = []
    for _ in range(3):
        sp = ",".join(map(str, rng.randint(0, 2, 15)))
        sess = ",".join(map(str, rng.randint(0, 400, 2 * S * L)))
        lines.append(f"1;{sp};0.5;{sess};2")
    f = tmp_path / "part-0.txt"
    f.write_text("\n".join(lines) + "\n")
    ds = DSINDataset([str(f)], 2, S, L)
    batches = list(ds)
    assert batches[0]["sess_input"].shape == (2, 2 * S, L)
    # tail zero-pads to the full batch; mask marks the real row
    assert batches[1]["sess_input"].shape == (2, 2 * S, L)
    assert batches[1]["mask"].tolist() == [1.0, 0.0]
