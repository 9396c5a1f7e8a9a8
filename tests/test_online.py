"""Online trainer: pass scheduling, donefile resume, delta/base export, shrink."""

import json
import os

import numpy as np
import pytest

from paddlerec_tpu.data.synthetic import write_criteo_sample
from paddlerec_tpu.train.online import (
    FeatureStats,
    OnlineTrainer,
    get_online_pass_interval,
)
from tests.conftest import small_config


def test_pass_interval_layout():
    passes = get_online_pass_interval(5, 2)
    assert len(passes) == 144  # 24h / 10min
    assert passes[0] == ["0000", "0005"]
    assert passes[-1] == ["2350", "2355"]
    hourly = get_online_pass_interval(60, 1, is_data_hourly_placed=True)
    assert len(hourly) == 24
    assert hourly[3] == ["03"]


def test_feature_stats_eviction():
    st = FeatureStats(10, decay=0.5, delete_threshold=0.8,
                      delete_after_unseen_days=2)
    st.observe(np.array([0, 0, 1]))
    evicted = st.end_day()
    # rows 0 (show 2→1.0) and 1 (1→0.5 < 0.8 evicted); others at 0
    assert 1 in evicted and 0 not in evicted
    assert all(r != 0 for r in evicted)


def _online_cfg(tmp_path, day="20240101"):
    # data laid out as <root>/<day>/<HHMM>/part-*
    for pass_dir in ("0000", "0010"):
        write_criteo_sample(
            str(tmp_path / "stream" / day / pass_dir),
            num_lines=64, num_files=1, vocab=5000,
        )
    cfg = small_config(tmp_path, model="rank.dnn")
    cfg["runner.train_data_dir"] = str(tmp_path / "stream")
    cfg["runner.model_save_path"] = str(tmp_path / "out")
    cfg["runner.start_day"] = day
    cfg["runner.end_day"] = day
    cfg["runner.split_interval"] = 10
    cfg["runner.split_per_pass"] = 1
    cfg["runner.checkpoint_per_pass"] = 1
    cfg["runner.save_delta_frequency"] = 2
    cfg["runner.save_first_base"] = True
    cfg["hyper_parameters.sparse_feature_number"] = 5000
    return cfg


def test_online_run_and_artifacts(tmp_path):
    cfg = _online_cfg(tmp_path)
    trainer = OnlineTrainer(cfg)
    metrics = trainer.run()
    assert np.isfinite(metrics["auc"])

    out = tmp_path / "out"
    donefile = out / "online_donefile.txt"
    records = [json.loads(l) for l in open(donefile) if l.strip()]
    kinds = [r["kind"] for r in records]
    assert "base" in kinds  # first base + end-of-day base
    assert "checkpoint" in kinds
    assert "delta" in kinds
    # checkpoint dirs exist
    ckpts = [r for r in records if r["kind"] == "checkpoint"]
    assert all(os.path.isdir(r["path"]) for r in ckpts)


def test_online_resume_skips_done_passes(tmp_path):
    cfg = _online_cfg(tmp_path)
    t1 = OnlineTrainer(cfg)
    t1.run()
    n_records = len(open(tmp_path / "out" / "online_donefile.txt").readlines())

    # a second run over the same day must skip everything (exactly-once)
    t2 = OnlineTrainer(cfg)
    t2.run()
    n_after = len(open(tmp_path / "out" / "online_donefile.txt").readlines())
    # only the end-of-day base record may be appended again
    assert n_after <= n_records + 1


def test_shrink_zeroes_rows(tmp_path):
    cfg = _online_cfg(tmp_path)
    trainer = OnlineTrainer(cfg)
    trainer.init_state()
    trainer._ensure_tracking()
    name, leaf = trainer._embedding_entries()[0]
    trainer.stats = {name: FeatureStats(
        leaf.shape[0],
        decay=0.0, delete_threshold=10.0,  # evict everything seen
    )}
    trainer.stats[name].observe(np.array([1, 2, 3]))
    n = trainer.shrink()
    assert n > 0
    table = np.asarray(trainer._embedding_entries()[0][1])
    assert np.allclose(table[1], 0)


def test_split_per_pass_trains_all_subdirs(tmp_path):
    """split_per_pass > 1: every interval sub-directory of a pass is
    trained, not just the first (regression: pass_dirs[0] only)."""
    import numpy as np

    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.data.synthetic import write_criteo_sample
    from paddlerec_tpu.train.online import OnlineTrainer

    day = "20240101"
    # two sub-dirs with DISTINCT row counts so coverage is observable
    write_criteo_sample(str(tmp_path / day / "0000"), num_lines=64,
                        num_files=1, vocab=1000)
    write_criteo_sample(str(tmp_path / day / "1200"), num_lines=64,
                        num_files=1, vocab=1000)
    cfg = Config({
        "runner.model": "rank.dnn",
        "runner.train_data_dir": str(tmp_path),
        "runner.train_batch_size": 32,
        "runner.model_save_path": str(tmp_path / "out"),
        "runner.days": day,
        "runner.split_interval": 720,   # 2 intervals/day: 00:00, 12:00
        "runner.split_per_pass": 2,     # ONE pass spans both
        "runner.checkpoint_per_pass": 1,
        "runner.start_day": day,
        "runner.end_day": day,
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.sparse_feature_number": 1000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.fc_sizes": [16],
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    })
    trainer = OnlineTrainer(cfg)
    seen = []
    orig = trainer.make_dataset

    def spy(data_dir, batch_size, shuffle=False, **kw):
        seen.append(data_dir)
        return orig(data_dir, batch_size, shuffle, **kw)

    trainer.make_dataset = spy
    metrics = trainer.run()
    assert metrics["total_ins"] == 128.0, metrics  # both sub-dirs trained
    assert any(d.endswith("0000") for d in seen)
    assert any(d.endswith("1200") for d in seen)
