"""Per-model smoke tests: one epoch on tiny synthetic data must run,
reduce loss, and lift AUC above chance — the TPU-native analog of the
reference's sample_data smoke runs (SURVEY §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerec_tpu.core.registry import get_model_class
from tests.conftest import small_config

RANK_MODELS = [
    "rank.lr",
    "rank.dnn",
    "rank.deepfm",
    "rank.wide_deep",
    "rank.fm",
    "rank.ffm",
    "rank.dcn",
    "rank.dcn_v2",
    "rank.xdeepfm",
    "rank.dlrm",
    "rank.gatenet",
    "rank.autoint",
    "rank.difm",
    "rank.deepfefm",
    "rank.flen",
    "rank.fgcnn",
    "rank.fat_deepffm",
    "rank.slot_dnn",
]


@pytest.mark.parametrize("name", RANK_MODELS)
def test_model_one_step(tmp_path, name):
    cfg = small_config(tmp_path, model=name)
    model_def = get_model_class(name)(cfg)
    batch = jax.tree.map(jnp.asarray, model_def.example_batch(32))
    params = model_def.init_params(jax.random.PRNGKey(0))
    loss, aux = model_def.train_forward(params, batch)
    assert np.isfinite(float(loss))
    assert aux["predictions"].shape == (32,)
    assert ((aux["predictions"] >= 0) & (aux["predictions"] <= 1)).all()


@pytest.mark.parametrize("name", RANK_MODELS)
def test_model_learns(tmp_path, name):
    """Loss must drop over a few hundred steps on the learnable synthetic task."""
    import optax

    cfg = small_config(tmp_path, model=name)
    model_def = get_model_class(name)(cfg)
    params = model_def.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(model_def.train_forward, has_aux=True)(
            params, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(0)
    from paddlerec_tpu.data.synthetic import synthetic_batch

    # fixed batch: training must memorize it (tests the full gradient path)
    batch = jax.tree.map(
        jnp.asarray, synthetic_batch(rng, 64, vocab=10000, dense_dim=13)
    )
    first = None
    last = None
    for i in range(40):
        params, opt_state, loss = step(params, opt_state, batch)
        if first is None:
            first = float(loss)
        last = float(loss)
    assert last < first * 0.9, f"{name}: loss did not decrease ({first} -> {last})"


def test_trainer_end_to_end(tmp_path, tmp_sample_data):
    """Full train → checkpoint → infer cycle through the Trainer."""
    from paddlerec_tpu.train.trainer import Trainer

    cfg = small_config(tmp_path, model="rank.deepfm")
    cfg["runner.model_save_path"] = str(tmp_path / "out")
    cfg["runner.infer_load_path"] = str(tmp_path / "out")
    cfg["runner.epochs"] = 2
    trainer = Trainer(cfg)
    metrics = trainer.train()
    assert metrics["total_ins"] > 0
    assert 0.0 <= metrics["auc"] <= 1.0

    # checkpoints exist for both epochs
    import os

    assert os.path.isdir(str(tmp_path / "out" / "0"))
    assert os.path.isdir(str(tmp_path / "out" / "1"))

    # fresh trainer restores and evaluates
    trainer2 = Trainer(cfg)
    infer_metrics = trainer2.evaluate(epoch_tag=1)
    assert infer_metrics["total_ins"] > 0


def test_checkpoint_resume_exact(tmp_path, tmp_sample_data):
    """Resume from epoch-0 checkpoint reproduces the same params as continuous training."""
    from paddlerec_tpu.train.trainer import Trainer

    cfg = small_config(tmp_path, model="rank.lr")
    cfg["runner.model_save_path"] = str(tmp_path / "o1")
    cfg["runner.epochs"] = 2
    t1 = Trainer(cfg)
    t1.train()

    cfg2 = small_config(tmp_path, model="rank.lr")
    cfg2["runner.model_save_path"] = str(tmp_path / "o2")
    cfg2["runner.epochs"] = 1
    t2 = Trainer(cfg2)
    t2.train()
    cfg3 = small_config(tmp_path, model="rank.lr")
    cfg3["runner.model_save_path"] = str(tmp_path / "o3")
    cfg3["runner.model_init_path"] = str(tmp_path / "o2" / "0")
    cfg3["runner.last_epoch"] = 0
    cfg3["runner.epochs"] = 2
    t3 = Trainer(cfg3)
    t3.train()

    p1 = jax.device_get(t1.state.params)
    p3 = jax.device_get(t3.state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6), p1, p3
    )
