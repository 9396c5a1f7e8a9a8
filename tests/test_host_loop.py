"""HostTableTrainer: GPUBox pass loop reachable from the CLI config
(VERDICT r1 item 3; reference static_gpubox_trainer.py:153-159,207,244).
"""

import numpy as np
import pytest

from tests.test_multihost_sparse import _write_slot_file


def _config(data_dir, **extra):
    from paddlerec_tpu.core.config import Config

    base = {
        "runner.model": "rank.dnn",
        "runner.train_data_dir": str(data_dir),
        "runner.train_batch_size": 16,
        "runner.epochs": 1,
        "runner.print_interval": 100,
        "runner.use_host_table": True,
        "runner.host_table_cache_rows": 64,
        "runner.files_per_pass": 1,
        "hyper_parameters.sparse_inputs_slots": 9,
        "hyper_parameters.sparse_feature_number": 100000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.dense_input_dim": 4,
        "hyper_parameters.fc_sizes": [16, 8],
        "hyper_parameters.optimizer.learning_rate": 0.05,
    }
    base.update(extra)
    return Config(base)


@pytest.fixture
def data_dir(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    # vocab 100k >> cache 64 rows: only per-pass working sets ever reach
    # the device.  Few distinct ids per file so a pass fits the cache.
    rng = np.random.RandomState(0)
    for i in range(3):
        ids = rng.randint(0, 100000, size=24)  # this file's id universe
        with open(d / f"part-{i}", "w") as f:
            for r in range(48):
                toks = [f"click:{rng.randint(0, 2)}"]
                toks += [f"dense_feature:{rng.rand():.4f}" for _ in range(4)]
                toks += [
                    f"{s + 1}:{rng.choice(ids)}" for s in range(8)
                ]
                f.write(" ".join(toks) + "\n")
    return d


def test_host_table_pass_training(data_dir, tmp_path):
    from paddlerec_tpu.train.host_loop import HostTableTrainer

    cfg = _config(data_dir,
                  **{"runner.model_save_path": str(tmp_path / "out")})
    ht = HostTableTrainer(cfg)
    metrics = ht.train()
    # 3 files x 48 rows, bs 16, drop_last -> 144 instances
    assert metrics["total_ins"] == 144.0, metrics
    assert 0.0 <= metrics["auc"] <= 1.0
    # host tier holds the union of all pass rows; device cache never
    # exceeded 64 rows while vocab is 100k
    assert 0 < ht.table.rows_resident <= 3 * 64
    assert ht.phys_rows >= 100000 // ht.pack
    # the accumulator persisted for trained rows
    assert ht.host_acc.max() > 0

    # checkpoint roundtrip restores the host tier
    ht2 = HostTableTrainer(_config(data_dir))
    ht2.load(str(tmp_path / "out"), 0)
    np.testing.assert_array_equal(
        ht2.table._initialized, ht.table._initialized
    )
    np.testing.assert_allclose(ht2.host_acc, ht.host_acc)


def test_host_table_rows_persist_across_passes(data_dir):
    """A row touched in pass 0 and pass 2 must carry its trained value
    (and optimizer state) across the host tier — the begin_pass cache
    must not re-initialize it."""
    from paddlerec_tpu.train.host_loop import HostTableTrainer

    # same file twice -> identical id set in pass 0 and pass 1
    files = sorted(str(p) for p in data_dir.iterdir())
    cfg = _config(data_dir, **{"runner.epochs": 2})
    ht = HostTableTrainer(cfg)
    ht.train()
    # after 2 epochs every trained row kept accumulating (acc grows
    # monotonically in adagrad — a reset would show acc ~ one epoch's)
    trained = ht.host_acc[ht.host_acc > 0]
    assert len(trained) > 0


def test_host_table_cache_overflow_raises(data_dir):
    from paddlerec_tpu.train.host_loop import HostTableTrainer

    cfg = _config(data_dir, **{"runner.host_table_cache_rows": 4})
    ht = HostTableTrainer(cfg)
    with pytest.raises(ValueError, match="host_table_cache_rows"):
        ht.train()


def test_cli_reaches_host_table(data_dir, tmp_path):
    """runner.use_host_table routes tools/train.py to the pass loop."""
    from paddlerec_tpu.tools.train import main

    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(
        f"""
runner:
  model: rank.dnn
  train_data_dir: {data_dir}
  train_batch_size: 16
  epochs: 1
  use_host_table: true
  host_table_cache_rows: 64
hyper_parameters:
  sparse_inputs_slots: 9
  sparse_feature_number: 100000
  sparse_feature_dim: 8
  dense_input_dim: 4
  fc_sizes: [16, 8]
"""
    )
    metrics = main(["-m", str(cfg_path)])
    assert metrics["total_ins"] == 144.0


def test_host_table_superbatch_wire_feed(data_dir):
    """The GPUBox pass loop rides the fast feed (compact wire + staged
    superbatches) and trains the same instance count as the plain path
    (VERDICT r2 item 2: production loops fed at the slow rate)."""
    from paddlerec_tpu.train.host_loop import HostTableTrainer

    plain = HostTableTrainer(_config(data_dir))
    m_plain = plain.train()
    fast = HostTableTrainer(_config(
        data_dir, **{"runner.wire_format": "compact",
                     "runner.feed_superbatch": 2}
    ))
    m_fast = fast.train()
    assert m_fast["total_ins"] == m_plain["total_ins"] > 0
    # identical data + seed: the staged/encoded path reproduces the
    # plain path's training outcome
    assert abs(m_fast["auc"] - m_plain["auc"]) < 1e-6, (m_fast, m_plain)
