"""slotbin binary dataset + compact wire format.

Covers the converted-data path (VERDICT r1 "feed the chip"): text →
slotbin conversion parity, mmap batch iteration (carry across files,
tail padding, epoch shuffles), trainer auto-detection, and the
wire encode/decode roundtrip inside a jitted step.
"""

import os

import numpy as np
import pytest

from paddlerec_tpu.data.binary import (
    BinarySlotDataset,
    SlotBinFile,
    convert_text_files,
    is_slotbin,
    write_slotbin,
)


def _write_bin(tmp_path, name, n, s=4, d=3, seed=0, dtype=np.int64):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 2, n).astype(np.float32)
    sparse = rng.randint(0, 1000, (n, s)).astype(dtype)
    dense = rng.rand(n, d).astype(np.float32)
    path = str(tmp_path / name)
    write_slotbin(path, labels, sparse, dense)
    return path, labels, sparse, dense


def test_roundtrip_and_magic(tmp_path):
    path, labels, sparse, dense = _write_bin(tmp_path, "a.bin", 17)
    assert is_slotbin(path)
    f = SlotBinFile(path)
    assert f.num_rows == 17 and f.num_sparse == 4 and f.dense_dim == 3
    np.testing.assert_array_equal(np.asarray(f.labels), labels)
    np.testing.assert_array_equal(np.asarray(f.sparse)[:, :, 0], sparse)
    np.testing.assert_array_equal(np.asarray(f.dense), dense)


def test_int32_storage_halves_bytes(tmp_path):
    p64, _, sp, _ = _write_bin(tmp_path, "a.bin", 100)
    p32 = str(tmp_path / "b.bin")
    write_slotbin(p32, np.zeros(100, np.float32), sp, None,
                  sparse_dtype=np.int32)
    assert os.path.getsize(p32) < os.path.getsize(p64)
    np.testing.assert_array_equal(
        np.asarray(SlotBinFile(p32).sparse)[:, :, 0], sp
    )


def test_batches_carry_across_files_and_pad_tail(tmp_path):
    pa, la, sa, da = _write_bin(tmp_path, "a.bin", 10, seed=1)
    pb, lb, sb, db = _write_bin(tmp_path, "b.bin", 7, seed=2)
    ds = BinarySlotDataset([pa, pb], batch_size=8, drop_last=False)
    batches = list(ds)
    # 17 rows -> 2 full batches + 1 padded tail
    assert len(batches) == 3
    all_labels = np.concatenate([la, lb])
    got = np.concatenate([b["label"] for b in batches])
    np.testing.assert_array_equal(got[:17], all_labels)
    tail = batches[-1]
    assert tail["mask"].sum() == 1  # 17 - 16
    assert tail["label"].shape == (8,)
    assert batches[0]["sparse"].shape == (8, 4)
    # drop_last drops the tail
    assert len(list(BinarySlotDataset([pa, pb], 8, drop_last=True))) == 2


def test_epoch_shuffles_differ_but_cover(tmp_path):
    paths = [
        _write_bin(tmp_path, f"{i}.bin", 16, seed=i)[0] for i in range(4)
    ]
    ds = BinarySlotDataset(paths, batch_size=8, shuffle_files=True,
                           shuffle_batches=True, seed=7)
    e1 = [b["label"].tobytes() for b in ds]
    e2 = [b["label"].tobytes() for b in ds]
    assert sorted(e1) == sorted(e2)  # same multiset of batches
    assert e1 != e2  # different order across epochs


def test_convert_text_files_matches_python_parse(tmp_path):
    lines = [
        "click:1 dense_feature:0.5 dense_feature:0.25 1:11 2:22 3:33",
        "click:0 dense_feature:0.1 dense_feature:0.2 1:44 3:55",
        "click:1 dense_feature:0.0 dense_feature:1.0 2:66 3:77",
    ]
    src = tmp_path / "part-0"
    src.write_text("\n".join(lines) + "\n")
    outs = convert_text_files(
        [str(src)], str(tmp_path / "bin"), num_sparse=3, dense_dim=2
    )
    f = SlotBinFile(outs[0])
    assert f.num_rows == 3
    np.testing.assert_array_equal(
        np.asarray(f.labels), np.array([1, 0, 1], np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(f.sparse)[:, :, 0],
        np.array([[11, 22, 33], [44, 0, 55], [0, 66, 77]]),
    )
    np.testing.assert_allclose(
        np.asarray(f.dense),
        np.array([[0.5, 0.25], [0.1, 0.2], [0.0, 1.0]], np.float32),
    )


def test_trainer_autodetects_slotbin(tmp_path):
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.train.trainer import Trainer

    _write_bin(tmp_path, "a.bin", 32, s=26, d=13)
    cfg = Config({
        "runner.train_data_dir": str(tmp_path),
        "runner.train_batch_size": 8,
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.sparse_feature_number": 1000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.fc_sizes": [16],
        "runner.model": "rank.dnn",
    })
    t = Trainer(cfg)
    ds = t.make_dataset(str(tmp_path), 8)
    assert isinstance(ds, BinarySlotDataset)
    batches = list(ds)
    assert len(batches) == 4
    assert batches[0]["sparse"].shape == (8, 26)


def test_wire_roundtrip_exact_ids():
    from paddlerec_tpu.data import wire

    rng = np.random.RandomState(0)
    batch = {
        "label": rng.randint(0, 2, 64).astype(np.float32),
        "sparse": rng.randint(0, 10**6, (64, 26)).astype(np.int64),
        "dense": rng.rand(64, 13).astype(np.float32),
        "mask": np.ones(64, np.float32),
    }
    enc = wire.encode_batch(batch, vocab=1_000_001)
    assert enc["sparse"].dtype == np.uint8 and enc["sparse"].shape == (64, 26, 3)
    assert enc["dense"].dtype == np.float16
    assert enc["label"].dtype == np.uint8
    assert wire.wire_bytes(enc) < 0.7 * wire.wire_bytes(batch)

    import jax

    dec = jax.jit(wire.decode_batch)(enc)
    np.testing.assert_array_equal(np.asarray(dec["sparse"]), batch["sparse"])
    np.testing.assert_array_equal(np.asarray(dec["label"]), batch["label"])
    np.testing.assert_array_equal(np.asarray(dec["mask"]), batch["mask"])
    np.testing.assert_allclose(
        np.asarray(dec["dense"]), batch["dense"], atol=5e-4
    )
    # decode is a no-op on plain batches
    plain = jax.jit(wire.decode_batch)(
        {k: v for k, v in batch.items()}
    )
    np.testing.assert_array_equal(np.asarray(plain["sparse"]), batch["sparse"])


def test_wire_big_vocab_falls_back_to_i32():
    from paddlerec_tpu.data import wire

    batch = {
        "label": np.zeros(4, np.float32),
        "sparse": np.array([[2**30], [5], [7], [2**24]], np.int64),
    }
    enc = wire.encode_batch(batch, vocab=2**31)
    assert enc["sparse"].dtype == np.int32
    np.testing.assert_array_equal(enc["sparse"], batch["sparse"])


def test_wire_trained_step_parity(tmp_path):
    """A jitted DNN step gives identical loss on wire-encoded vs plain
    batches (ids exact; dense f16 tolerance)."""
    import jax

    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.core.registry import get_model_class
    from paddlerec_tpu.data import wire

    cfg = Config({
        "hyper_parameters.sparse_inputs_slots": 9,
        "hyper_parameters.sparse_feature_number": 1000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.dense_input_dim": 4,
        "hyper_parameters.fc_sizes": [16],
    })
    md = get_model_class("rank.dnn")(cfg)
    params = md.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    batch = {
        "label": rng.randint(0, 2, 16).astype(np.float32),
        "sparse": rng.randint(0, 1000, (16, 8)).astype(np.int64),
        "dense": rng.rand(16, 4).astype(np.float32),
        "mask": np.ones(16, np.float32),
    }

    def fwd(p, b):
        loss, _ = md.train_forward(p, wire.decode_batch(b))
        return loss

    plain = float(jax.jit(fwd)(params, batch))
    enc = float(jax.jit(fwd)(params, wire.encode_batch(batch, 1000)))
    assert abs(plain - enc) < 1e-3, (plain, enc)


def test_superbatch_staging_matches_plain(tmp_path):
    """runner.feed_superbatch groups K batches into one transfer; the
    on-device slice must reproduce EXACTLY the plain path's training
    (same batches, same order -> identical final metrics)."""
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.train.trainer import Trainer

    _write_bin(tmp_path, "a.bin", 96, s=8, d=4, seed=9)
    base = {
        "runner.model": "rank.dnn",
        "runner.train_data_dir": str(tmp_path),
        "runner.train_batch_size": 16,
        "runner.epochs": 1,
        "runner.print_interval": 100,
        "hyper_parameters.sparse_inputs_slots": 9,
        "hyper_parameters.sparse_feature_number": 1000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.dense_input_dim": 4,
        "hyper_parameters.fc_sizes": [16],
    }
    m_plain = Trainer(Config(dict(base))).train()
    m_super = Trainer(
        Config(dict(base, **{"runner.feed_superbatch": 4}))
    ).train()
    assert abs(m_plain["auc"] - m_super["auc"]) < 1e-6
    assert m_plain["total_ins"] == m_super["total_ins"] == 96.0


def test_superbatch_with_wire_and_tail(tmp_path):
    """Superbatch + wire encoding + a tail group smaller than K."""
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.train.trainer import Trainer

    _write_bin(tmp_path, "a.bin", 112, s=8, d=4, seed=11)  # 7 batches, K=4
    cfg = Config({
        "runner.model": "rank.dnn",
        "runner.train_data_dir": str(tmp_path),
        "runner.train_batch_size": 16,
        "runner.epochs": 1,
        "runner.print_interval": 100,
        "runner.feed_superbatch": 4,
        "runner.wire_format": "compact",
        "hyper_parameters.sparse_inputs_slots": 9,
        "hyper_parameters.sparse_feature_number": 1000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.dense_input_dim": 4,
        "hyper_parameters.fc_sizes": [16],
    })
    metrics = Trainer(cfg).train()
    assert metrics["total_ins"] == 112.0


def test_wire_out_of_range_ids_hash_early_or_escalate():
    """Values >= 2^24 reduce mod vocab (consumers hash by vocab anyway;
    keeps the u24 shape stable for superbatch stacking); NEGATIVE ids
    (sentinels mod would corrupt) skip u24 entirely."""
    import jax.numpy as jnp

    from paddlerec_tpu.data import wire

    big = {
        "label": np.zeros(4, np.float32),
        "sparse": np.array([[2**25], [5], [7], [9]], np.int64),
    }
    enc = wire.encode_batch(big, vocab=1000)
    assert enc["sparse"].dtype == np.uint8  # stays u24, hashed early
    dec = wire.decode_batch({"sparse": jnp.asarray(enc["sparse"])})
    assert int(dec["sparse"][0, 0]) == (2**25) % 1000
    neg = {
        "label": np.zeros(2, np.float32),
        "sparse": np.array([[-1], [5]], np.int64),
    }
    enc2 = wire.encode_batch(neg, vocab=1000)
    assert enc2["sparse"].dtype != np.uint8


def test_wire_encoder_pins_representation():
    """The stream's sparse representation never flips shape mid-stream:
    u24 stays u24 (ids >= 2^24 reduce mod vocab — consumers hash by
    vocab anyway), so superbatch staging can stack any two batches."""
    import numpy as np

    from paddlerec_tpu.data.wire import WireEncoder, decode_batch

    enc = WireEncoder(vocab=1000)
    b1 = {"sparse": np.array([[1, 2], [3, 4]], np.int64)}
    o1 = enc(b1)
    assert o1["sparse"].shape == (2, 2, 3) and o1["sparse"].dtype == np.uint8
    # boundary-straddling batch: same shape, values hashed early
    big = {"sparse": np.array([[1 << 25, 5], [6, 7]], np.int64)}
    o2 = enc(big)
    assert o2["sparse"].shape == (2, 2, 3) and o2["sparse"].dtype == np.uint8
    import jax.numpy as jnp

    dec = decode_batch({"sparse": jnp.asarray(o2["sparse"])})
    assert int(dec["sparse"][0, 0]) == (1 << 25) % 1000

    # NEGATIVE ids (sentinel semantics) escalate — once, with a warning
    enc2 = WireEncoder(vocab=1000)
    enc2(b1)
    neg = {"sparse": np.array([[-1, 2], [3, 4]], np.int64)}
    o3 = enc2(neg)
    assert o3["sparse"].dtype == np.int32  # escalated, not corrupted
    assert enc2._mode == "i32"  # pinned for the rest of the stream


def test_superbatch_stacker_splits_on_shape_change():
    """A mid-stream shape change (ragged tail, wire escalation) splits
    superbatch groups instead of crashing np.stack."""
    import numpy as np

    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.train.trainer import Trainer

    cfg = Config({
        "runner.model": "rank.dnn",
        "runner.feed_superbatch": 4,
        "hyper_parameters.sparse_inputs_slots": 9,
        "hyper_parameters.sparse_feature_number": 1000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.dense_input_dim": 4,
        "hyper_parameters.fc_sizes": [16, 8],
    })
    t = Trainer(cfg)

    def batches():
        for shape in [(8, 8), (8, 8), (8, 8, 3), (8, 8, 3), (8, 16, 3)]:
            yield {"sparse": np.zeros(shape, np.uint8),
                   "label": np.zeros(shape[0], np.float32),
                   "mask": np.ones(shape[0], np.float32)}

    groups = [
        sb for sb, i in t._staged_superbatches(batches(), 4) if i == 0
    ]
    lead = [int(next(iter(g.values())).shape[0]) for g in groups]
    assert lead == [2, 2, 1]  # split at each shape boundary


def test_superbatch_eval_matches_plain(tmp_path):
    """evaluate() rides superbatch staging (infer_super); its metrics
    must be bit-identical to the single-batch eval path, including a
    tail group smaller than K and drop_last=False stragglers."""
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.train.trainer import Trainer

    _write_bin(tmp_path, "a.bin", 104, s=8, d=4, seed=13)  # 6.5 batches
    base = {
        "runner.model": "rank.dnn",
        "runner.train_data_dir": str(tmp_path),
        "runner.test_data_dir": str(tmp_path),
        "runner.train_batch_size": 16,
        "runner.infer_batch_size": 16,
        "runner.epochs": 1,
        "runner.print_interval": 100,
        "hyper_parameters.sparse_inputs_slots": 9,
        "hyper_parameters.sparse_feature_number": 1000,
        "hyper_parameters.sparse_feature_dim": 8,
        "hyper_parameters.dense_input_dim": 4,
        "hyper_parameters.fc_sizes": [16],
    }
    def ev(over):
        t = Trainer(Config(dict(base, **over)))
        t.init_state(seed=3)
        return t.evaluate()

    e_plain = ev({})
    e_super = ev({"runner.feed_superbatch": 4})
    assert e_plain["total_ins"] == e_super["total_ins"] == 104.0
    assert abs(e_plain["auc"] - e_super["auc"]) < 1e-6  # bit-exact path
    # + wire: dense rides the link as f16 (deliberate bytes/row trade),
    # so predictions may move by rounding, not by batching
    e_wire = ev({"runner.feed_superbatch": 4, "runner.wire_format": "compact"})
    assert e_wire["total_ins"] == 104.0
    assert abs(e_plain["auc"] - e_wire["auc"]) < 1e-3
