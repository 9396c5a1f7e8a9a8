import numpy as np
import pytest

from paddlerec_tpu.data.schema import SlotSchema, schema_from_config
from paddlerec_tpu.data.slot_reader import (
    SlotDataset,
    list_data_files,
    parse_slot_lines,
    shard_files,
)
from paddlerec_tpu.data.synthetic import write_criteo_sample


def test_parse_line_basic():
    schema = SlotSchema.criteo(num_sparse=3, dense_dim=2)
    lines = ["click:1 dense_feature:0.5 dense_feature:0.25 1:7 2:8 3:9"]
    out = parse_slot_lines(lines, schema)
    assert out["label"][0] == 1.0
    np.testing.assert_array_equal(out["sparse"][0, :, 0], [7, 8, 9])
    np.testing.assert_allclose(out["dense"][0], [0.5, 0.25])


def test_parse_missing_slots_padded():
    schema = SlotSchema.criteo(num_sparse=3, dense_dim=2)
    out = parse_slot_lines(["click:0 2:5"], schema)
    np.testing.assert_array_equal(out["sparse"][0, :, 0], [0, 5, 0])
    np.testing.assert_allclose(out["dense"][0], [0.0, 0.0])


def test_dataset_batching(tmp_path):
    data_dir = str(tmp_path / "train")
    write_criteo_sample(data_dir, num_lines=100, num_files=2, vocab=1000)
    schema = SlotSchema.criteo()
    files = list_data_files(data_dir)
    ds = SlotDataset(files, schema, batch_size=32, drop_last=True)
    batches = list(ds)
    assert len(batches) == 3  # 100 rows → 3 full batches of 32
    for b in batches:
        assert b["sparse"].shape == (32, 26)
        assert b["dense"].shape == (32, 13)
        assert b["label"].shape == (32,)
        assert b["mask"].sum() == 32


def test_dataset_pad_last(tmp_path):
    data_dir = str(tmp_path / "train")
    write_criteo_sample(data_dir, num_lines=40, num_files=1, vocab=1000)
    schema = SlotSchema.criteo()
    ds = SlotDataset(list_data_files(data_dir), schema, batch_size=32, drop_last=False)
    batches = list(ds)
    assert len(batches) == 2
    last = batches[-1]
    assert last["sparse"].shape == (32, 26)  # padded to full shape
    assert last["mask"].sum() == 8


def test_shard_files_partition():
    files = [f"f{i}" for i in range(10)]
    shards = [shard_files(files, w, 3) for w in range(3)]
    flat = sorted(sum(shards, []))
    assert flat == sorted(files)  # exact cover
    with pytest.raises(ValueError):
        shard_files(["a"], 0, 2)


def test_schema_from_config(tmp_path):
    from tests.conftest import small_config

    cfg = small_config(tmp_path)
    schema = schema_from_config(cfg)
    assert schema.num_sparse == 26
    assert schema.dense_dim == 13
    assert schema.label_slot == "click"


def test_parse_slot_lines_dense_overflow_dropped():
    """Lines with MORE dense values than the slot's dim must not crash
    or bleed into neighbouring slots (reference readers truncate)."""
    from paddlerec_tpu.data.schema import SlotSchema
    from paddlerec_tpu.data.slot_reader import parse_slot_lines

    schema = SlotSchema.criteo(num_sparse=2, dense_dim=3)
    good = "click:1 dense_feature:0.1 dense_feature:0.2 dense_feature:0.3 1:7 2:9"
    extra = ("click:0 dense_feature:0.5 dense_feature:0.5 dense_feature:0.5 "
             "dense_feature:0.9 dense_feature:0.9 1:3 2:4")
    out = parse_slot_lines([good, extra], schema)
    assert out["dense"].shape == (2, 3)
    assert abs(out["dense"][1].sum() - 1.5) < 1e-6  # extras dropped


def test_pipe_command_reader_stage(tmp_path):
    """runner.pipe_command: arbitrary preprocess subprocess per file
    (reference QueueDataset pipe_command, reader_helper.py:220-233).
    Here the RAW file is csv; the pipe converts to slot format."""
    import numpy as np

    from paddlerec_tpu.data.schema import SlotSchema
    from paddlerec_tpu.data.slot_reader import SlotDataset

    raw = tmp_path / "raw.csv"
    raw.write_text("1,10,20\n0,30,40\n1,50,60\n0,70,80\n")
    cmd = (
        "awk -F, '{print \"click:\" $1, \"1:\" $2, \"2:\" $3}'"
    )
    schema = SlotSchema(label_slot="click", sparse_slots=["1", "2"])
    ds = SlotDataset([str(raw)], schema, batch_size=2, pipe_command=cmd)
    batches = list(ds)
    assert len(batches) == 2
    np.testing.assert_array_equal(batches[0]["label"], [1, 0])
    np.testing.assert_array_equal(batches[0]["sparse"][:, 0], [10, 30])
    np.testing.assert_array_equal(batches[1]["sparse"][:, 1], [60, 80])

    # failing pipe surfaces, not silently truncates
    bad = SlotDataset([str(raw)], schema, batch_size=2,
                      pipe_command="false")
    import pytest

    with pytest.raises(RuntimeError, match="pipe_command"):
        list(bad)


def test_pipe_command_native_criteo_parser(tmp_path):
    """The C++ criteo parser binary plugs in as a pipe_command — the
    exact reference deployment shape (tools/dataset/parser.cpp)."""
    import pytest

    from paddlerec_tpu.native import NativeUnavailable

    try:
        from paddlerec_tpu.native import build_criteo_parser

        binary = build_criteo_parser()
    except NativeUnavailable:
        pytest.skip("no native toolchain")
    from paddlerec_tpu.data.schema import SlotSchema
    from paddlerec_tpu.data.slot_reader import SlotDataset

    # raw criteo tsv: label, 13 ints, 26 cat hex strings
    row = "1\t" + "\t".join(str(i) for i in range(13)) + "\t" + "\t".join(
        f"a{i:07x}" for i in range(26)
    )
    raw = tmp_path / "day0"
    raw.write_text("\n".join([row, row]) + "\n")
    schema = SlotSchema(
        label_slot="click",
        sparse_slots=[str(i) for i in range(1, 27)],
        dense_slots=["dense_feature"],
        dense_dims=[13],
    )
    ds = SlotDataset([str(raw)], schema, batch_size=2,
                     pipe_command=binary)
    batches = list(ds)
    assert len(batches) == 1
    assert batches[0]["label"].tolist() == [1.0, 1.0]
    assert batches[0]["sparse"].shape == (2, 26)
    assert (batches[0]["sparse"] > 0).all()
