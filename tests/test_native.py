"""Native C++ components: criteo parser, fast reader, cube KV."""

import os
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    subprocess.run(["which", "g++"], capture_output=True).returncode != 0,
    reason="no C++ toolchain",
)


def test_criteo_parser_binary():
    from paddlerec_tpu.native import build_criteo_parser

    binpath = build_criteo_parser()
    raw = (
        "1\t" + "\t".join(str(i) for i in range(1, 14)) + "\t"
        + "\t".join(f"c{i}" for i in range(26)) + "\n"
        + "bad line\n"  # wrong column count → skipped
    )
    out = subprocess.run([binpath], input=raw, capture_output=True, text=True)
    lines = out.stdout.strip().splitlines()
    assert len(lines) == 1
    line = lines[0]
    assert line.startswith("click:1 ")
    assert line.count("dense_feature:") == 13
    assert " 1:" in line and " 26:" in line
    # normalization: col1 value "1" → (1-0)/20 = 0.05
    assert "dense_feature:0.050000" in line
    # hashing is stable per run
    out2 = subprocess.run([binpath], input=raw, capture_output=True, text=True)
    assert out2.stdout == out.stdout


@pytest.fixture
def criteo_file(tmp_path):
    from paddlerec_tpu.data.synthetic import write_criteo_sample

    write_criteo_sample(str(tmp_path / "train"), num_lines=500, num_files=1,
                        vocab=9999)
    return str(tmp_path / "train" / "part-0")


def test_fast_reader_parity(criteo_file):
    from paddlerec_tpu.data.schema import SlotSchema
    from paddlerec_tpu.data.slot_reader import SlotDataset
    from paddlerec_tpu.native.reader import parse_file

    labels, sparse, dense = parse_file(criteo_file, 26, 13, num_threads=4)
    batch = next(iter(SlotDataset(
        [criteo_file], SlotSchema.criteo(26, 13), batch_size=500,
        drop_last=False,
    )))
    n = len(labels)
    assert n == 500
    assert np.array_equal(batch["sparse"][:n], sparse)
    assert np.allclose(batch["dense"][:n], dense, atol=1e-6)
    assert np.array_equal(batch["label"].astype(np.int64)[:n], labels)


def test_native_dataset_batches_and_padding(criteo_file):
    from paddlerec_tpu.native.reader import NativeSlotDataset

    batches = list(NativeSlotDataset([criteo_file], 26, 13, batch_size=128,
                                     drop_last=False))
    assert len(batches) == 4  # 500 rows → 3 full + 1 padded tail
    assert batches[-1]["mask"].sum() == 500 - 3 * 128
    assert batches[-1]["sparse"].shape == (128, 26)


def test_native_dataset_in_trainer(tmp_path, criteo_file):
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.train.trainer import Trainer

    cfg = Config({
        "runner.model": "rank.dnn",
        "runner.train_data_dir": os.path.dirname(criteo_file),
        "runner.test_data_dir": os.path.dirname(criteo_file),
        "runner.train_batch_size": 64,
        "runner.epochs": 1,
        "runner.reader_type": "native",
        "runner.print_interval": 5,
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.sparse_feature_number": 10000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.fc_sizes": [32, 16],
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    })
    metrics = Trainer(cfg).train()
    assert "auc" in metrics


def test_cube_kv_roundtrip(tmp_path):
    from paddlerec_tpu.native.cube import CubeClient, export_table

    rng = np.random.RandomState(0)
    keys = rng.choice(100000, 2000, replace=False).astype(np.int64)
    vals = rng.randn(2000, 8).astype(np.float32)
    paths = export_table(str(tmp_path / "cube"), keys, vals, num_shards=3)
    assert len(paths) == 3
    with CubeClient(paths) as client:
        assert client.dim == 8
        got = client.seek(keys)
        np.testing.assert_allclose(got, vals, rtol=1e-6)
        # misses return zeros (or the default vector)
        miss = client.seek(np.asarray([10**9], np.int64))
        assert np.allclose(miss, 0.0)
    default = np.full(8, 7.0, np.float32)
    with CubeClient(paths, default_value=default) as client:
        miss = client.seek(np.asarray([10**9], np.int64))
        np.testing.assert_allclose(miss[0], default)


def test_cube_export_from_packed_table(tmp_path):
    """Round trip through the training-side packed layout → serving KV."""
    import jax

    from paddlerec_tpu.native.cube import CubeClient, export_table
    from paddlerec_tpu.ops.packed_embedding import (
        init_packed_table, unpack_table,
    )

    vocab, dim = 1000, 9
    table = np.asarray(
        init_packed_table(jax.random.PRNGKey(0), vocab, dim)
    )
    dense = unpack_table(table, vocab, dim)
    paths = export_table(
        str(tmp_path / "cube"), np.arange(vocab, dtype=np.int64), dense, 2
    )
    with CubeClient(paths) as client:
        ids = np.asarray([0, 17, 999], np.int64)
        np.testing.assert_allclose(client.seek(ids), dense[ids], rtol=1e-6)


def test_cube_many_shards_routing(tmp_path):
    """≥10 shards: lexicographic path order would misroute key%shards
    (cube_shard_10 sorts before cube_shard_2) — ids must come from the
    filename."""
    from paddlerec_tpu.native.cube import CubeClient, export_table

    rng = np.random.RandomState(0)
    keys = np.arange(3000, dtype=np.int64)
    vals = rng.randn(3000, 4).astype(np.float32)
    paths = export_table(str(tmp_path / "cube"), keys, vals, num_shards=12)
    # hand the client a lexicographically shuffled path list
    with CubeClient(sorted(paths)) as client:
        got = client.seek(keys)
        np.testing.assert_allclose(got, vals, rtol=1e-6)
    # non-contiguous shard set is rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="contiguous"):
        CubeClient(paths[:3] + paths[4:])


def test_fast_reader_no_trailing_newline(tmp_path):
    from paddlerec_tpu.data.synthetic import write_criteo_sample
    from paddlerec_tpu.native.reader import parse_file

    write_criteo_sample(str(tmp_path / "d"), num_lines=10, num_files=1,
                        vocab=100)
    path = str(tmp_path / "d" / "part-0")
    # strip the trailing newline
    data = open(path, "rb").read().rstrip(b"\n")
    open(path, "wb").write(data)
    labels, sparse, dense = parse_file(path, 26, 13)
    assert len(labels) == 10  # last record kept
