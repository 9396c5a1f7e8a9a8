"""Geo local-SGD sync, filesystem helper, dump_fields eval path."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config


def test_geo_sync_delta_push_math():
    """Single-process exercise of the rendezvous math: dense leaves move
    by diff/n_active, tables absorb exactly the touched-row diffs, and
    rendezvous traffic is proportional to touched rows (the reference's
    k-step sparse diff push, program_helper.py:44-51)."""
    from paddlerec_tpu.train.trainer import Trainer

    cfg = Config({
        "runner.model": "rank.dnn",
        "hyper_parameters.sparse_inputs_slots": 9,
        "hyper_parameters.sparse_feature_number": 4096,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.dense_input_dim": 4,
        "hyper_parameters.fc_sizes": [16, 8],
        "hyper_parameters.optimizer.learning_rate": 0.01,
    })
    t = Trainer(cfg)
    t.init_state()
    t._init_geo_state()
    (tname, base_table), = t._geo_base["tables"].items()

    # perturb one table row + one dense leaf, as k local steps would
    entries = dict(t._geo_param_entries())
    leaf = entries[tname]
    touched_row = 7
    new_leaf = leaf.at[touched_row].add(1.0)
    dname = next(n for n in t._geo_base["dense"]
                 if np.issubdtype(t._geo_base["dense"][n].dtype, np.floating))
    new_params = jax.tree_util.tree_map_with_path(
        lambda p, l: (
            new_leaf if "/".join(str(getattr(k, "key", k)) for k in p) == tname
            else l + 0.5 if "/".join(str(getattr(k, "key", k)) for k in p) == dname
            else l
        ),
        t.state.params,
    )
    t.state = t.state.replace(params=new_params)
    t._geo_touched[tname][touched_row] = True

    before = np.asarray(base_table[touched_row]).copy()
    t._geo_sync(np.asarray([1]))

    # table base absorbed the +1 diff on the touched row only
    after = t._geo_base["tables"][tname]
    np.testing.assert_allclose(after[touched_row], before + 1.0, rtol=1e-5)
    # device table row matches the base
    entries2 = dict(t._geo_param_entries())
    np.testing.assert_allclose(
        np.asarray(entries2[tname][touched_row], np.float32),
        after[touched_row], rtol=1e-5,
    )
    # dense leaf moved by diff/n_active = +0.5
    np.testing.assert_allclose(
        np.asarray(t._geo_base["dense"][dname]),
        np.asarray(jax.device_get(entries2[dname])), rtol=1e-5,
    )
    # traffic ∝ touched rows: one row's diff, nowhere near the table
    assert 0 < t._geo_max_sync_bytes < base_table.nbytes / 8
    # touched mask reset for the next round
    assert t._geo_touched[tname].sum() == 0


def test_local_fs(tmp_path):
    from paddlerec_tpu.utils.fs import LocalFS, get_fs

    fs = get_fs(str(tmp_path))
    assert isinstance(fs, LocalFS)
    with fs.open(str(tmp_path / "a/b.txt"), "w") as f:
        f.write("hi")
    assert fs.exists(str(tmp_path / "a/b.txt"))
    fs.upload(str(tmp_path / "a/b.txt"), str(tmp_path / "c.txt"))
    assert fs.ls(str(tmp_path)) == [str(tmp_path / "a"), str(tmp_path / "c.txt")]
    fs.rm(str(tmp_path / "c.txt"))
    assert not fs.exists(str(tmp_path / "c.txt"))


def test_hdfs_scheme_rejected():
    import pytest

    from paddlerec_tpu.utils.fs import get_fs

    with pytest.raises(RuntimeError, match="gs"):
        get_fs("hdfs://cluster/path")


def test_dump_fields_eval(tmp_path):
    from paddlerec_tpu.data.synthetic import write_criteo_sample
    from paddlerec_tpu.train.trainer import Trainer
    from paddlerec_tpu.utils.onoff_diff import diff_report

    data = tmp_path / "train"
    write_criteo_sample(str(data), num_lines=64, num_files=1, vocab=5000)
    dump = tmp_path / "dump.jsonl"
    cfg = Config({
        "runner.model": "rank.dnn",
        "runner.train_data_dir": str(data),
        "runner.test_data_dir": str(data),
        "runner.infer_batch_size": 16,
        "runner.dump_fields": ["predictions"],
        "runner.dump_fields_path": str(dump),
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.sparse_feature_number": 5000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.fc_sizes": [32, 16],
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    })
    trainer = Trainer(cfg)
    trainer.evaluate()
    lines = [json.loads(l) for l in open(dump)]
    assert len(lines) == 64
    assert all("predictions" in r["vars"] for r in lines)
    # a dump diffed against itself is consistent — the onoff_diff contract
    rep = diff_report(str(dump), str(dump))
    assert rep["consistent"] and rep["num_shared"] == 64
