"""Online day/pass loop on a dp×mp mesh.

The production streaming loop (train/online.py) with the embedding
table row-sharded over mp: delta publishing and feature-lifecycle
bookkeeping must map batches onto the mp-PADDED table geometry
(train/touched.py recognizes the engine's rounded-up row count), and
pass training must ride the exchange without overflow on hashed ids.
"""

import json
import os

import numpy as np
import pytest

from paddlerec_tpu.parallel import sharding as shd
from paddlerec_tpu.parallel.mesh import MP_AXIS, create_mesh
from paddlerec_tpu.train.online import OnlineTrainer
from tests.test_online import _online_cfg


@pytest.fixture
def low_shard_threshold():
    old = shd.MIN_ROWS_TO_SHARD
    shd.MIN_ROWS_TO_SHARD = 64
    yield
    shd.MIN_ROWS_TO_SHARD = old


def test_online_pass_on_mp_mesh(tmp_path, low_shard_threshold):
    cfg = _online_cfg(tmp_path)
    cfg["hyper_parameters.distributed_embedding"] = 1
    trainer = OnlineTrainer(cfg, mesh=create_mesh(2, 4))
    metrics = trainer.run()
    assert np.isfinite(metrics["auc"])

    # the table really is mp-sharded (padded rows)
    emb = trainer.state.params["embedding"]["embedding"]
    assert emb.sharding.spec[0] == MP_AXIS
    assert emb.shape[0] % 4 == 0

    out = tmp_path / "out"
    records = [
        json.loads(l)
        for l in open(out / "online_donefile.txt") if l.strip()
    ]
    kinds = [r["kind"] for r in records]
    assert "base" in kinds and "delta" in kinds
    # delta artifacts must cover the padded-geometry table (touched.py
    # maps ids through the mp-padded row count instead of warning)
    deltas = [r for r in records if r["kind"] == "delta"]
    assert deltas and all(os.path.isdir(r["path"]) for r in deltas)
    metas = [
        json.load(open(os.path.join(r["path"], "delta_meta.json")))
        for r in deltas
    ]
    touched_total = sum(int(m["rows_touched"]) for m in metas)
    assert touched_total > 0, metas
    # keys map back to logical feasigns (padded physical rows excluded)
    for m in metas:
        for t in m["tables"]:
            assert t["keys"] >= 0
    assert any(t["keys"] > 0 for m in metas for t in m["tables"]), metas
