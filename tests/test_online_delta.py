"""Online-loop production features (VERDICT r1 item 7): true mode-1
delta publishing, cross-worker global shuffle, next-pass prefetch, and
fs-routed donefile IO."""

import json
import os

import numpy as np
import pytest

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.data.synthetic import write_criteo_sample
from paddlerec_tpu.train.online import OnlineTrainer


def _online_cfg(tmp_path, day="20240101", vocab=1024, **extra):
    cfg = {
        "runner.model": "rank.dnn",
        "runner.train_data_dir": str(tmp_path / "data"),
        "runner.train_batch_size": 32,
        "runner.model_save_path": str(tmp_path / "out"),
        "runner.days": day,
        "runner.start_day": day,
        "runner.end_day": day,
        "runner.split_interval": 720,
        "runner.split_per_pass": 1,
        "runner.checkpoint_per_pass": 1,
        "runner.save_delta_frequency": 1,
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.sparse_feature_number": vocab,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.fc_sizes": [16],
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.01,
    }
    cfg.update(extra)
    return Config(cfg)


def test_delta_is_proportional_to_touched_rows(tmp_path):
    """The mode-1 delta must contain only touched rows (r1 published the
    FULL params under a delta_ tag) and be cube-readable."""
    day = "20240101"
    # 64 rows over a small id universe << vocab
    rng = np.random.RandomState(0)
    d = tmp_path / "data" / day / "0000"
    d.mkdir(parents=True)
    ids = rng.randint(0, 500, size=40)
    with open(d / "part-0", "w") as f:
        for _ in range(64):
            toks = [f"click:{rng.randint(0, 2)}"]
            toks += [f"dense_feature:{rng.rand():.4f}" for _ in range(13)]
            toks += [f"{s + 1}:{rng.choice(ids)}" for s in range(26)]
            f.write(" ".join(toks) + "\n")

    trainer = OnlineTrainer(_online_cfg(tmp_path, vocab=100000))
    trainer.run()
    deltas = [p for p in os.listdir(tmp_path / "out")
              if p.startswith("delta_")]
    assert deltas, os.listdir(tmp_path / "out")
    delta_dir = tmp_path / "out" / deltas[0]
    meta = json.loads((delta_dir / "delta_meta.json").read_text())
    # only the touched physical rows published — far below vocab
    assert 0 < meta["rows_touched"] <= 40 * 26
    table_meta = [t for t in meta["tables"] if t.get("keys", 0) > 0]
    assert table_meta, meta
    # cube shards load and answer the touched keys
    if table_meta[0].get("format") == "cube":
        from paddlerec_tpu.native import NativeUnavailable

        tdir = delta_dir / table_meta[0]["name"]
        try:
            from paddlerec_tpu.native.cube import CubeClient

            client = CubeClient(sorted(
                str(tdir / p) for p in os.listdir(tdir)
            ))
            assert client.dim == 8
        except NativeUnavailable:
            pass  # toolchain-less environment: files still exist
        assert table_meta[0]["keys"] < meta["vocab"]

    # delta artifact is small: way below a full params-only checkpoint
    delta_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs_ in os.walk(delta_dir) for f in fs_
    )
    vocab_rows = 100000 // 16  # packed rows at dim 8
    full_table_bytes = vocab_rows * 128 * 4
    assert delta_bytes < full_table_bytes / 4, (
        delta_bytes, full_table_bytes
    )


def test_delta_resets_after_publish(tmp_path):
    day = "20240101"
    write_criteo_sample(str(tmp_path / "data" / day / "0000"),
                        num_lines=64, num_files=1, vocab=1000)
    trainer = OnlineTrainer(_online_cfg(tmp_path, vocab=1000))
    trainer.run()
    assert trainer._touched
    # base at end-of-day (and the delta save) reset the bookkeeping
    assert all(m.sum() == 0 for m in trainer._touched.values())


def test_global_shuffle_covers_all_rows(tmp_path):
    """runner.global_shuffle redistributes rows but trains the same
    instance count (single process: rank 0 takes every row)."""
    day = "20240101"
    write_criteo_sample(str(tmp_path / "data" / day / "0000"),
                        num_lines=96, num_files=2, vocab=1000)
    trainer = OnlineTrainer(_online_cfg(
        tmp_path, vocab=1000, **{"runner.global_shuffle": True}
    ))
    metrics = trainer.run()
    assert metrics["total_ins"] == 96.0, metrics


def test_prefetch_next_pass(tmp_path):
    """With runner.prefetch, pass N+1's dataset is staged while pass N
    trains and then consumed (not re-parsed)."""
    day = "20240101"
    write_criteo_sample(str(tmp_path / "data" / day / "0000"),
                        num_lines=64, num_files=1, vocab=1000)
    write_criteo_sample(str(tmp_path / "data" / day / "1200"),
                        num_lines=64, num_files=1, vocab=1000)
    trainer = OnlineTrainer(_online_cfg(
        tmp_path, vocab=1000,
        **{"runner.prefetch": True, "runner.split_interval": 720},
    ))
    consumed = []
    orig = trainer._take_prefetched

    def spy(key):
        ds = orig(key)
        consumed.append((key, ds is not None))
        return ds

    trainer._take_prefetched = spy
    metrics = trainer.run()
    assert metrics["total_ins"] == 64.0
    # pass 0 had nothing staged; pass 1 consumed the prefetched dataset
    assert consumed[0][1] is False
    assert consumed[1][1] is True


def test_donefile_roundtrip_through_fs(tmp_path):
    from paddlerec_tpu.utils.fs import LocalFS

    fs = LocalFS()
    p = str(tmp_path / "sub" / "donefile.txt")
    fs.append_line(p, "a\t1")
    fs.append_line(p, "b\t2")
    assert fs.read_text(p).splitlines() == ["a\t1", "b\t2"]
    assert fs.isdir(str(tmp_path)) and not fs.isdir(p)


def test_feature_stats_global_merge():
    """Multi-host stats merge (sparse exchange): show sums every host's
    increments since the last merge, rows any host observed count as
    seen-today everywhere, and repeated merges never double-count."""
    import numpy as np

    from paddlerec_tpu.train.online import FeatureStats

    hosts = [FeatureStats(10, track_base=True) for _ in range(2)]
    hosts[0].observe(np.array([1, 1, 2]))
    hosts[1].observe(np.array([2, 3]))

    def merge(stats):
        deltas = [st.local_delta() for st in stats]
        rows_by_host = [r for r, _ in deltas]
        vals_by_host = [v for _, v in deltas]
        for st in stats:
            st.apply_global(rows_by_host, vals_by_host)

    merge(hosts)
    for st in hosts:
        assert st.show[1] == 2.0 and st.show[2] == 2.0 and st.show[3] == 1.0
        assert st.seen[1] and st.seen[2] and st.seen[3]
        assert st.unseen_days[1] == -1
    # second merge with no new observations: a no-op (no double count)
    merge(hosts)
    assert all(st.show[2] == 2.0 for st in hosts)
    # end_day on the merged state is identical everywhere
    ev0, ev1 = hosts[0].end_day(), hosts[1].end_day()
    assert np.array_equal(ev0, ev1)
    # post-end_day observations merge from the refreshed base
    hosts[0].observe(np.array([5]))
    merge(hosts)
    assert all(st.show[5] == 1.0 for st in hosts)
    assert all(st.show[9] == 0.0 for st in hosts)
