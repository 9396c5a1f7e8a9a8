"""Device-resident feed (runner.feed_device_resident): staged
superbatches stay in HBM after epoch 0 and replay on later epochs —
the reference InMemoryDataset host-RAM ingest
(tools/utils/static_ps/reader_helper.py:240-312) one tier up the
memory hierarchy."""

import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.data.synthetic import write_criteo_sample
from paddlerec_tpu.train.trainer import Trainer


def _cfg(data_dir, **over):
    base = {
        "runner.model": "rank.dnn",
        "runner.train_data_dir": data_dir,
        "runner.test_data_dir": data_dir,
        "runner.train_batch_size": 16,
        "runner.infer_batch_size": 16,
        "runner.epochs": 3,
        "runner.print_interval": 1000,
        "runner.wire_format": "compact",
        "runner.feed_superbatch": 2,
        "runner.feed_device_resident": True,
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.sparse_feature_number": 1000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.fc_sizes": [16],
    }
    base.update(over)
    return Config(base)


def test_resident_replay_across_epochs(tmp_path):
    data = str(tmp_path / "train")
    write_criteo_sample(data, num_lines=96, num_files=2, vocab=1000)
    t = Trainer(_cfg(data))
    m = t.train()
    assert m["auc"] > 0  # trained
    key = [k for k in t._resident if k.startswith("train:")]
    assert key, t._resident.keys()
    ent = t._resident[key[0]]
    # 96 rows / bs 16 = 6 batches → 3 superbatches of K=2, replayed
    # for epochs 1 and 2 with zero restaging
    assert ent["sbs"] is not None and len(ent["sbs"]) == 3
    assert ent["replays"] == 2
    assert ent["bytes"] > 0


def test_resident_eval_identical_to_streaming(tmp_path):
    data = str(tmp_path / "train")
    write_criteo_sample(data, num_lines=96, num_files=2, vocab=1000)
    t = Trainer(_cfg(data, **{"runner.epochs": 1}))
    t.init_state()
    # first evaluate stages + caches; second replays from HBM — AUC is
    # an order-free bucket accumulation, so the results must match
    ev1 = t.evaluate()
    assert any(k.startswith("eval:") for k in t._resident)
    ev2 = t.evaluate()
    assert abs(ev1["auc"] - ev2["auc"]) < 1e-12


def test_resident_spills_to_streaming_over_cap(tmp_path):
    data = str(tmp_path / "train")
    write_criteo_sample(data, num_lines=96, num_files=2, vocab=1000)
    t = Trainer(_cfg(data, **{"runner.resident_max_gb": 1e-9}))
    m = t.train()
    assert m["auc"] > 0
    ent = [v for k, v in t._resident.items() if k.startswith("train:")]
    assert ent and ent[0]["sbs"] is None  # spilled: streaming fallback


def test_resident_off_by_default(tmp_path):
    data = str(tmp_path / "train")
    write_criteo_sample(data, num_lines=64, num_files=1, vocab=1000)
    cfg = _cfg(data, **{"runner.feed_device_resident": False,
                        "runner.epochs": 1})
    t = Trainer(cfg)
    t.train()
    assert not t._resident


def test_resident_restages_when_corpus_changes(tmp_path):
    """The resident key carries a corpus content signature: refreshed
    on-disk data must be restaged, and the superseded entry dropped
    (frees its HBM) instead of silently replaying the old corpus."""
    import os
    import time

    data = str(tmp_path / "train")
    write_criteo_sample(data, num_lines=96, num_files=2, vocab=1000)
    t = Trainer(_cfg(data, **{"runner.epochs": 1}))
    t.train()
    keys1 = [k for k in t._resident if k.startswith("train:")]
    assert len(keys1) == 1

    # refresh the corpus in place (new content, mtime bumped)
    write_criteo_sample(data, num_lines=96, num_files=2, vocab=1000,
                        seed=99)
    f0 = sorted(os.listdir(data))[0]
    now = time.time() + 2
    os.utime(os.path.join(data, f0), (now, now))
    t.train()
    keys2 = [k for k in t._resident if k.startswith("train:")]
    assert len(keys2) == 1
    assert keys2 != keys1  # new signature → restaged
