"""Geo local-SGD sync, filesystem helper, dump_fields eval path."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.core.config import Config


def test_geo_local_steps_then_sync():
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from paddlerec_tpu.train.geo import local_steps_then_sync

    mesh = Mesh(np.array(jax.devices()[:4]), ("geo",))
    params = jnp.arange(4, dtype=jnp.float32)  # distinct per slice
    # k=3 local steps each adding slice-local +1; sync averages
    batches = jnp.ones((4, 3), jnp.float32)

    @jax.jit
    def run(params, batches):
        def body(p, b):
            def step(carry, x):
                return carry + x, carry + x

            return local_steps_then_sync(
                step, p[0], b[0], "geo",
                params_of=lambda c: c,
                with_params=lambda c, s: s,
            )

        def wrapped(p, b):
            final, outs = body(p, b)
            return final[None], outs[None]

        return shard_map(
            wrapped, mesh=mesh, in_specs=(P("geo"), P("geo", None)),
            out_specs=(P("geo"), P("geo", None)),
        )(params, batches)

    final, locals_ = run(params, batches)
    # local trajectories diverge (0+1.., 1+1.., ...)
    np.testing.assert_allclose(np.asarray(locals_)[:, -1],
                               params + 3)
    # after sync every slice holds the mean of (params + 3)
    np.testing.assert_allclose(np.asarray(final),
                               np.full(4, float((params + 3).mean())))


def test_geo_average_params_host():
    from paddlerec_tpu.train.geo import average_params

    copies = [{"w": jnp.ones((3,)) * i} for i in range(4)]
    avg = average_params(copies)
    np.testing.assert_allclose(np.asarray(avg["w"]), 1.5)


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
