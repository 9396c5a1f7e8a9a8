"""Per-table delta/eviction bookkeeping (VERDICT r2 item 6): a
multi-table model (dien: item + cat tables with DIFFERENT row counts)
must publish delta shards for EVERY table, keyed by param path — the
round-2 first-table-geometry bookkeeping silently covered at most one.
"""
import json
import os

import numpy as np

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.train.online import OnlineTrainer


def _write_din_data(path, n_lines=64, items=200, cats=40, seed=0):
    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(seed)
    with open(os.path.join(path, "part-0.txt"), "w") as f:
        for _ in range(n_lines):
            hlen = rng.randint(1, 6)
            hist_i = " ".join(str(rng.randint(1, items)) for _ in range(hlen))
            hist_c = " ".join(str(rng.randint(1, cats)) for _ in range(hlen))
            f.write(
                f"{hist_i};{hist_c};{rng.randint(1, items)};"
                f"{rng.randint(1, cats)};{rng.randint(0, 2)}\n"
            )


def _dien_online_cfg(tmp_path):
    return Config({
        "runner.model": "rank.dien",
        "runner.train_data_dir": str(tmp_path / "data"),
        "runner.model_save_path": str(tmp_path / "out"),
        "runner.train_batch_size": 16,
        "runner.split_interval": 720,   # 2 passes/day
        "runner.split_per_pass": 1,
        "runner.checkpoint_per_pass": 1,
        "runner.save_delta_frequency": 1,
        "runner.start_day": "20240101",
        "runner.end_day": "20240101",
        "runner.infer_first": False,
        "hyper_parameters.item_count": 200,
        "hyper_parameters.cat_count": 40,
        "hyper_parameters.item_emb_size": 8,
        "hyper_parameters.cat_emb_size": 8,
        "hyper_parameters.gru_hidden": 8,
        "hyper_parameters.fc_sizes": [16, 8],
        "hyper_parameters.attention_sizes": [8],
        "hyper_parameters.optimizer.class": "adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    })


def test_dien_delta_covers_every_table(tmp_path):
    _write_din_data(str(tmp_path / "data" / "20240101" / "0000"))
    trainer = OnlineTrainer(_dien_online_cfg(tmp_path))
    trainer.run()

    # the pass-cadence delta was published with one shard set per table
    deltas = [d for d in os.listdir(tmp_path / "out")
              if d.startswith("delta_")]
    assert deltas, "no delta artifact published"
    delta_dir = tmp_path / "out" / sorted(deltas)[-1]
    meta = json.loads((delta_dir / "delta_meta.json").read_text())
    by_name = {t["name"]: t for t in meta["tables"]}
    for table in ("item_emb_embedding", "cat_emb_embedding"):
        assert table in by_name, (table, sorted(by_name))
        assert by_name[table]["keys"] > 0, (table, by_name[table])

    # the published npz rows match the per-table touched sets (row counts
    # differ between tables, so geometry mix-ups surface here)
    item_npz = np.load(delta_dir / "item_emb_embedding_delta.npz")
    cat_npz = np.load(delta_dir / "cat_emb_embedding_delta.npz")
    assert item_npz["values"].shape[1] == 8
    assert cat_npz["values"].shape[1] == 8
    assert item_npz["rows"].max() < 200
    assert cat_npz["rows"].max() < 40

    # per-table lifecycle stats exist for all three tables
    assert set(trainer.stats) == {
        "item_emb/embedding", "cat_emb/embedding"
    }


def test_dien_shrink_is_per_table(tmp_path):
    _write_din_data(str(tmp_path / "data" / "20240101" / "0000"))
    trainer = OnlineTrainer(_dien_online_cfg(tmp_path))
    trainer.run()
    # force-evict everything seen in the CAT table only
    cat = trainer.stats["cat_emb/embedding"]
    cat.decay = 0.0
    cat.delete_threshold = 10.0
    keep = trainer.stats["item_emb/embedding"]
    keep.delete_threshold = -1.0
    keep.delete_after_unseen_days = 10**6
    n = trainer.shrink()
    assert n > 0
    import jax

    flat = jax.tree_util.tree_flatten_with_path(trainer.state.params)[0]
    leaves = {
        "/".join(str(getattr(k, "key", k)) for k in p): np.asarray(l)
        for p, l in flat
    }
    seen_rows = np.nonzero(cat.seen | (cat.show == 0))[0]
    # evicted cat rows are zeroed...
    evicted = np.asarray(leaves["cat_emb/embedding"])
    assert np.allclose(evicted[2:5][np.abs(evicted[2:5]).sum(1) == 0], 0)
    assert (np.abs(evicted).sum(1) == 0).sum() > 0
    # ...while the item table kept its rows
    assert (np.abs(leaves["item_emb/embedding"]).sum(1) > 0).all()
