"""Cube export: packed-table width inference.

Parity target: the reference's serving-side table dump
(tools/inference README + get_xbox_model.py) — the exported KV rows must
be the logical (vocab, dim) table, which requires recovering the packed
lane-window width w from the row count alone.  Regression for a real
bug: widths must be tried DESCENDING, else any vocab with
``vocab mod (2*pack) <= pack`` matches the next-narrower width's
[base, 2*base) window first and exports garbage keys/values.
"""

import numpy as np

from paddlerec_tpu.ops.packed_embedding import pack_table
from paddlerec_tpu.tools.export_cube import collect_embedding_tables


def _params(dense):
    return {"embedding": {"embedding": pack_table(dense)}}


def test_width_inference_exact_rows():
    # vocab 993 (993 % 16 == 1): the w=8 window [63, 126) contains the
    # true w=16 row count 125 — an ascending scan exports a (993, 8)
    # mis-unpacked table; descending must recover (993, 16) exactly.
    rng = np.random.RandomState(0)
    dense = rng.randn(993, 16).astype(np.float32)
    tables = collect_embedding_tables(_params(dense), 993, 9)
    got = tables["embedding/embedding"]
    assert got.shape == (993, 16)
    np.testing.assert_allclose(got, dense, atol=0)


def test_width_inference_mp_padded_rows():
    # mp-sharded tables pad rows to an mp multiple (125 → 128 at mp=8);
    # the window test must still pick w=16.
    rng = np.random.RandomState(1)
    dense = rng.randn(993, 16).astype(np.float32)
    packed = pack_table(dense)
    padded = np.concatenate(
        [packed, np.zeros((3, 128), np.float32)], axis=0
    )
    tables = collect_embedding_tables(
        {"embedding": {"embedding": padded}}, 993, 9
    )
    got = tables["embedding/embedding"]
    assert got.shape == (993, 16)
    np.testing.assert_allclose(got, dense, atol=0)


def test_delta_tap_excluded():
    # sparse_update's grad tap lives at embedding/embedding_delta — the
    # PARENT component matches EMBEDDING_PARAM_NAME, so the leaf name
    # must be checked or the all-zero tap exports as a spurious table.
    rng = np.random.RandomState(3)
    dense = rng.randn(993, 16).astype(np.float32)
    params = {"embedding": {
        "embedding": pack_table(dense),
        "embedding_delta": np.zeros((256, 128), np.float32),
    }}
    tables = collect_embedding_tables(params, 993, 9)
    assert set(tables) == {"embedding/embedding"}


def test_width_inference_w8():
    # dim <= 8 tables (w=8) must still resolve to their own window.
    rng = np.random.RandomState(2)
    dense = rng.randn(1000, 8).astype(np.float32)
    tables = collect_embedding_tables(_params(dense), 1000, 8)
    got = tables["embedding/embedding"]
    assert got.shape == (1000, 8)
    np.testing.assert_allclose(got, dense, atol=0)
