"""Shared per-table touched-row mapping.

Maps a host batch onto the physical rows of each embedding table, keyed
by the "/"-joined param path.  Consumers: OnlineTrainer (mode-1 delta
publishing + feature lifecycle, flow_helper.py:372-533 parity) and the
geo trainer (k-step touched-row diff push, program_helper.py:44-51
parity).

The model's ``touched_tables`` hook wins when it returns a dict; the
fused-CTR default maps batch["sparse"] through the pack arithmetic onto
every table whose geometry matches the configured vocab.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np


def batch_rows_by_table(
    model_def,
    batch,
    table_rows: Dict[str, int],
    warn: Optional[Callable[[str, str], None]] = None,
) -> Dict[str, np.ndarray]:
    """name → physical row ids of ``batch`` for each table in table_rows.

    warn(name, why) is called (once-semantics are the caller's concern)
    for tables that get no mapping.
    """
    warn = warn or (lambda name, why: None)
    hooked = model_def.touched_tables(batch)
    if hooked is not None:
        out = {}
        for name, rows in hooked.items():
            if name in table_rows:
                out[name] = np.asarray(rows).reshape(-1)
            else:
                warn(name, "touched_tables names no param table")
        for name in table_rows:
            if name not in hooked:
                warn(name, "absent from touched_tables")
        return out
    if "sparse" not in batch:
        return {}
    ids = np.asarray(batch["sparse"]).reshape(-1)
    vocab = getattr(model_def, "vocab_size", None)
    from paddlerec_tpu.ops.sparse_update import infer_pack

    out = {}
    from paddlerec_tpu.parallel import context as parallel_context

    mp = parallel_context.model_parallel_size()
    for name, n_rows in table_rows.items():
        if vocab:
            try:
                pack = infer_pack(vocab, n_rows)
            except ValueError:
                try:
                    # mp-sharded engine geometry (rows padded to an mp
                    # multiple, parallel/embedding.py ShardedEmbedding)
                    pack = infer_pack(vocab, n_rows, mp) if mp > 1 else None
                except ValueError:
                    pack = None
                if pack is None:
                    warn(name, f"rows {n_rows} do not match vocab {vocab} "
                               "under any pack factor")
                    continue
            out[name] = ((ids % vocab) // pack) % n_rows
        else:
            out[name] = ids % n_rows
    return out
