"""Disk (SSD) tier for the host-tiered table (VERDICT r3 item 3).

Parity target: the reference's last capacity rung — DownpourSparseSSDTable
/ SSD_EMBEDDING with cache thresholds
(tools/utils/static_ps/config_fleet.py:122-125): the full sparse table
spills past host RAM onto disk, with the hot working set cached in RAM
by the accessor's show statistics.

Contract proven here: with ``ram_rows`` set, training is BIT-IDENTICAL
to the RAM-only path (rows only move between tiers), RAM residency never
exceeds the cap, the cold majority lives in the mmap spill file, and the
async pass-level prefetch changes nothing about results.
"""

import numpy as np
import pytest

from tests.test_host_loop import _config, data_dir  # noqa: F401


def _run_passes(tbl, n_passes=6, rows_per_pass=40, vocab=1000, seed=7,
                prefetch=False):
    """A deterministic begin/train/end pass sequence; 'training' = add a
    per-row delta derived from the row id (so results are comparable
    across storage modes)."""
    rng = np.random.RandomState(seed)
    pass_ids = [
        np.unique(rng.randint(0, vocab, rows_per_pass))
        for _ in range(n_passes)
    ]
    for i, ids in enumerate(pass_ids):
        cache = np.asarray(tbl.begin_pass(ids))
        if prefetch and i + 1 < n_passes:
            tbl.prefetch(pass_ids[i + 1])
        cache = cache + (ids[:, None] % 13 + 1).astype(np.float32) * 0.01
        tbl.end_pass(cache)
    return pass_ids


def test_spill_bit_identical_to_dense():
    from paddlerec_tpu.parallel.host_table import HostTieredTable

    vocab, dim = 1000, 8
    dense = HostTieredTable(vocab, dim, seed=3)
    spill = HostTieredTable(vocab, dim, seed=3, ram_rows=32)
    _run_passes(dense)
    _run_passes(spill)
    assert dense.rows_resident == spill.rows_resident > 32
    # RAM residency respects the cap; the rest lives on disk
    assert spill.rows_in_ram <= 32
    assert spill.rows_on_disk > 0
    assert spill.rows_in_ram + spill.rows_on_disk == spill.rows_resident
    all_ids = np.arange(vocab)
    np.testing.assert_array_equal(
        dense.lookup_host(all_ids), spill.lookup_host(all_ids)
    )


def test_spill_prefetch_bit_identical():
    from paddlerec_tpu.parallel.host_table import HostTieredTable

    vocab, dim = 1000, 8
    plain = HostTieredTable(vocab, dim, seed=3, ram_rows=32)
    pre = HostTieredTable(vocab, dim, seed=3, ram_rows=32)
    _run_passes(plain, prefetch=False)
    _run_passes(pre, prefetch=True)
    all_ids = np.arange(vocab)
    np.testing.assert_array_equal(
        plain.lookup_host(all_ids), pre.lookup_host(all_ids)
    )


def test_spill_eviction_prefers_cold_rows():
    """Eviction is driven by the decayed show counts: rows touched every
    pass stay in RAM while one-shot rows spill."""
    from paddlerec_tpu.parallel.host_table import HostTieredTable

    tbl = HostTieredTable(1000, 4, seed=0, ram_rows=16)
    hot = np.arange(8)
    for i in range(5):
        cold = np.arange(100 + 20 * i, 120 + 20 * i)
        ids = np.union1d(hot, cold)
        cache = np.asarray(tbl.begin_pass(ids))
        tbl.end_pass(cache)
    # the hot rows were shown 5x; they must still be RAM-resident
    st = tbl._store
    assert (st.slot_of[hot] >= 0).all(), st.slot_of[hot]
    assert tbl.rows_on_disk > 0


def test_spill_shrink_and_reinit():
    from paddlerec_tpu.parallel.host_table import HostTieredTable

    tbl = HostTieredTable(500, 4, seed=1, ram_rows=8, show_decay=0.5)
    ids = np.arange(30)
    tbl.end_pass(np.asarray(tbl.begin_pass(ids)))
    assert tbl.rows_on_disk > 0
    tbl.end_day()
    tbl.end_day()
    evicted = tbl.shrink(threshold=0.5)
    assert evicted == 30
    assert tbl.rows_resident == 0
    assert tbl.rows_on_disk == 0
    # freed rows re-init deterministically (same values as a fresh table)
    fresh = HostTieredTable(500, 4, seed=1)
    np.testing.assert_array_equal(
        np.asarray(tbl.begin_pass(ids)), np.asarray(fresh.begin_pass(ids))
    )


def test_spill_pass_larger_than_slab():
    """A single pass whose working set exceeds the RAM slab still trains
    (overflow rows go straight to disk)."""
    from paddlerec_tpu.parallel.host_table import HostTieredTable

    dense = HostTieredTable(300, 4, seed=2)
    spill = HostTieredTable(300, 4, seed=2, ram_rows=8)
    for t in (dense, spill):
        ids = np.arange(100)
        cache = np.asarray(t.begin_pass(ids))
        t.end_pass(cache + 1.0)
    assert spill.rows_in_ram <= 8
    assert spill.rows_on_disk >= 92
    np.testing.assert_array_equal(
        dense.lookup_host(np.arange(300)),
        spill.lookup_host(np.arange(300)),
    )


def test_host_loop_spill_trains_past_ram_cap(data_dir, tmp_path):  # noqa: F811
    """E2E: HostTableTrainer with host_table_ram_rows far below the
    materialized working set — results must be bit-identical to the
    RAM-only run, with the overflow resident on disk."""
    from paddlerec_tpu.train.host_loop import HostTableTrainer

    ram_only = HostTableTrainer(_config(data_dir))
    m_ram = ram_only.train()

    spill_cfg = _config(data_dir, **{
        "runner.host_table_ram_rows": 24,
        "runner.host_table_spill_dir": str(tmp_path / "spill"),
    })
    spilled = HostTableTrainer(spill_cfg)
    m_spill = spilled.train()

    assert m_spill["total_ins"] == m_ram["total_ins"] == 144.0
    # the materialized vocab exceeds the RAM cap: disk tier engaged
    assert spilled.table.rows_resident > 24
    assert spilled.table.rows_in_ram <= 24
    assert spilled.table.rows_on_disk > 0
    # bit-identical training through the spill tier
    assert m_spill["auc"] == m_ram["auc"], (m_spill, m_ram)
    ids_r, vals_r = ram_only.table.snapshot_rows()
    ids_s, vals_s = spilled.table.snapshot_rows()
    np.testing.assert_array_equal(ids_r, ids_s)
    np.testing.assert_array_equal(vals_r, vals_s)
    np.testing.assert_array_equal(ram_only.host_acc, spilled.host_acc)


def test_host_loop_spill_checkpoint_roundtrip(data_dir, tmp_path):  # noqa: F811
    from paddlerec_tpu.train.host_loop import HostTableTrainer

    cfg = _config(data_dir, **{
        "runner.host_table_ram_rows": 24,
        "runner.host_table_spill_dir": str(tmp_path / "spill"),
        "runner.model_save_path": str(tmp_path / "out"),
    })
    ht = HostTableTrainer(cfg)
    ht.train()

    cfg2 = _config(data_dir, **{
        "runner.host_table_ram_rows": 24,
        "runner.host_table_spill_dir": str(tmp_path / "spill2"),
    })
    ht2 = HostTableTrainer(cfg2)
    ht2.load(str(tmp_path / "out"), 0)
    ids1, vals1 = ht.table.snapshot_rows()
    ids2, vals2 = ht2.table.snapshot_rows()
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_array_equal(vals1, vals2)
    np.testing.assert_allclose(ht2.host_acc, ht.host_acc)


def test_prefetch_refresh_on_overlap():
    """A row trained in pass i and prefetched for pass i+1 must arrive
    with its POST-pass-i value (end_pass refreshes the snapshot)."""
    from paddlerec_tpu.parallel.host_table import HostTieredTable

    tbl = HostTieredTable(100, 4, seed=5, ram_rows=4)
    ids = np.arange(10)
    cache = np.asarray(tbl.begin_pass(ids))
    tbl.prefetch(ids)  # snapshot taken BEFORE this pass's training lands
    tbl.end_pass(cache + 7.0)
    got = np.asarray(tbl.begin_pass(ids))
    np.testing.assert_array_equal(got, cache + 7.0)
