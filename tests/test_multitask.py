"""Multitask family: per-task AUC metrics, census/ali-ccp readers, e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import get_model_class

DENSE_MODELS = ["multitask.mmoe", "multitask.share_bottom", "multitask.ple"]
CCP_MODELS = ["multitask.esmm", "multitask.aitm"]


def dense_cfg():
    return Config({
        "hyper_parameters.feature_size": 64,
        "hyper_parameters.expert_num": 4,
        "hyper_parameters.expert_size": 8,
        "hyper_parameters.tower_size": 4,
        "hyper_parameters.gate_num": 2,
        "hyper_parameters.optimizer.class": "adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    })


def ccp_cfg():
    return Config({
        "hyper_parameters.sparse_feature_number": 10000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.num_field": 23,
        "hyper_parameters.max_len": 3,
        "hyper_parameters.ctr_fc_sizes": [32, 16],
        "hyper_parameters.cvr_fc_sizes": [32, 16],
        "hyper_parameters.tower_dims": [32, 16, 8],
        "hyper_parameters.optimizer.class": "adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    })


@pytest.mark.parametrize("name", DENSE_MODELS + CCP_MODELS)
def test_forward_and_metrics(name):
    cfg = dense_cfg() if name in DENSE_MODELS else ccp_cfg()
    md = get_model_class(name)(cfg)
    batch = jax.tree.map(jnp.asarray, md.example_batch(16))
    params = md.init_params(jax.random.PRNGKey(0))
    loss, aux = md.train_forward(params, batch)
    assert np.isfinite(float(loss))
    updates = md.metric_updates(aux)
    assert len(updates) == len(md.metric_names)
    for name_, (p, l, m) in updates.items():
        assert p.shape == (16,)
        assert ((np.asarray(p) >= 0) & (np.asarray(p) <= 1)).all()


@pytest.mark.parametrize("name", DENSE_MODELS + CCP_MODELS)
def test_learns(name):
    cfg = dense_cfg() if name in DENSE_MODELS else ccp_cfg()
    md = get_model_class(name)(cfg)
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


def test_census_reader(tmp_path):
    rng = np.random.RandomState(0)
    path = tmp_path / "train" / "part-0"
    path.parent.mkdir(parents=True)
    with open(path, "w") as f:
        for _ in range(70):
            vals = [str(rng.randint(0, 2)), str(rng.randint(0, 2))] + [
                f"{v:.3f}" for v in rng.rand(64)
            ]
            f.write(",".join(vals) + "\n")
    md = get_model_class("multitask.mmoe")(dense_cfg())
    batches = list(md.make_dataset(str(tmp_path / "train"), 32))
    assert len(batches) == 3
    assert batches[0]["dense"].shape == (32, 64)
    assert batches[0]["labels"].shape == (32, 2)
    assert batches[-1]["mask"].sum() == 6  # 70 - 64 padded


def test_aliccp_reader(tmp_path):
    path = tmp_path / "train" / "part-0"
    path.parent.mkdir(parents=True)
    with open(path, "w") as f:
        f.write("1,1,0,idx,101:55,101:66,205:7,301:9\n")
        f.write("2,0,0,idx,101:3\n")
    md = get_model_class("multitask.esmm")(ccp_cfg())
    batches = list(md.make_dataset(str(tmp_path / "train"), 2))
    b = batches[0]
    assert b["labels"][0, 0] == 1 and b["labels"][0, 1] == 0
    assert b["sparse"][0, 0, 0] == 55 and b["sparse"][0, 0, 1] == 66
    assert b["sparse_mask"][0, 0, :2].sum() == 2
    assert b["sparse"][0, 22, 0] == 9  # field 301 is last


def test_trainer_multitask_e2e(tmp_path):
    from paddlerec_tpu.train.trainer import Trainer

    rng = np.random.RandomState(0)
    data = tmp_path / "train"
    data.mkdir()
    with open(data / "part-0", "w") as f:
        for _ in range(128):
            vals = [str(rng.randint(0, 2)), str(rng.randint(0, 2))] + [
                f"{v:.3f}" for v in rng.rand(64)
            ]
            f.write(",".join(vals) + "\n")
    cfg = dense_cfg()
    cfg["runner.model"] = "multitask.mmoe"
    cfg["runner.train_data_dir"] = str(data)
    cfg["runner.test_data_dir"] = str(data)
    cfg["runner.train_batch_size"] = 32
    cfg["runner.infer_batch_size"] = 32
    cfg["runner.epochs"] = 1
    cfg["runner.print_interval"] = 100
    cfg["config_dir"] = str(tmp_path)
    trainer = Trainer(cfg)
    metrics = trainer.train()
    assert "auc_marital" in metrics
    assert np.isfinite(metrics["auc"])
