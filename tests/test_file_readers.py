"""File readers for ensfm / tisas / iprec / kim (the reference's
per-model RecDataset readers, reduced to numeric formats)."""

import numpy as np
import pytest


def _fixture(name, tmp_path):
    import sys

    sys.path.insert(0, "test_tipc")
    import prepare

    getattr(prepare, f"write_{name}")(str(tmp_path))
    return str(tmp_path / name)


def test_ensfm_reader_binds_and_pads(tmp_path):
    from paddlerec_tpu.models.recall.ensfm.model import ENSFMDataset

    root = _fixture("ensfm", tmp_path)
    ds = ENSFMDataset([f"{root}/part-0"], num_users=200, num_items=100,
                      max_pos=16, batch_size=8)
    batches = list(ds)
    assert batches, "no batches"
    b = batches[0]
    assert b["user_features"].shape == (8, 1)
    assert b["item_attribute"].shape == (100, 1)
    assert b["positives"].shape == (8, 16)
    # pad token is num_items; real positives are < num_items
    assert b["positives"].max() == 100
    assert (b["positives"] < 100).any()


def test_tisas_reader_time_matrix(tmp_path):
    from paddlerec_tpu.models.recall.tisas.model import TiSASDataset

    root = _fixture("tisas", tmp_path)
    ds = TiSASDataset([f"{root}/part-0"], item_num=100, maxlen=16,
                      time_span=64, batch_size=8)
    b = next(iter(ds))
    assert b["log_seqs"].shape == (8, 16)
    assert b["time_matrices"].shape == (8, 16, 16)
    assert b["time_matrices"].max() < 64
    # symmetric relation matrix, zero diagonal
    assert (b["time_matrices"] == b["time_matrices"].transpose(0, 2, 1)).all()
    assert (np.diagonal(b["time_matrices"], axis1=1, axis2=2) == 0).all()
    # negatives never equal positives on valid positions
    valid = b["pos_seqs"] > 0
    assert (b["neg_seqs"][valid] != b["pos_seqs"][valid]).all()
    # left padding: zeros only at the front
    first_real = (b["log_seqs"] > 0).argmax(1)
    for row, fr in zip(b["log_seqs"], first_real):
        assert (row[fr:] > 0).all()


def test_iprec_reader_shapes_and_garbage(tmp_path):
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.models.rank.iprec.model import IPRECDataset, ModelDef

    root = _fixture("iprec", tmp_path)
    with open(f"{root}/part-0", "a") as f:
        f.write("not json\n{\"broken\": true}\n")
    md = ModelDef(Config({
        "runner.model": "rank.iprec",
        "hyper_parameters.num_users": 100,
        "hyper_parameters.num_items": 100,
        "hyper_parameters.num_bizs": 50,
        "hyper_parameters.f_max_len": 4,
        "hyper_parameters.u_max_i": 8,
        "hyper_parameters.u_max_f": 8,
        "hyper_parameters.u_max_pack": 4,
        "hyper_parameters.pack_max_nei_b": 4,
        "hyper_parameters.pack_max_nei_f": 4,
        "hyper_parameters.hidden_units": 16,
        "hyper_parameters.k": 2,
    }))
    rows = sum(int(b["mask"].sum()) for b in IPRECDataset(
        md, [f"{root}/part-0"], batch_size=32
    ))
    assert rows == 128  # garbage lines skipped
    b = next(iter(IPRECDataset(md, [f"{root}/part-0"], batch_size=32)))
    assert b["user_packages"].shape == (32, 4, 6)  # f_max_len + 2 wide
    assert b["friends"].shape == (32, 4)


def test_kim_reader_entities(tmp_path):
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.models.match.kim.model import KIMDataset, ModelDef

    root = _fixture("kim", tmp_path)
    md = ModelDef(Config({
        "runner.model": "match.kim",
        "hyper_parameters.vocab_size": 200,
        "hyper_parameters.max_sents": 5,
        "hyper_parameters.max_sentence": 8,
        "hyper_parameters.max_entity_num": 3,
        "hyper_parameters.npratio": 2,
        "hyper_parameters.embedding_size": 16,
        "hyper_parameters.hidden_size": 16,
    }))
    ds = md.make_dataset(root, batch_size=16)
    b = next(iter(ds))
    assert b["titles"].shape == (16, 3, 8)
    assert b["entities"].shape == (16, 3, 3, 100)
    assert b["one_hops"].shape == (16, 3, 3, 3, 100)
    assert b["clicked_title"].shape == (16, 5, 8)
    assert (b["labels"][:, 0] == 1).all() and (b["labels"][:, 1:] == 0).all()
    # entity vectors come from the embedding file, not zeros
    assert np.abs(b["entities"]).sum() > 0
