"""Synthetic slot-format data generation (sample data / tests / bench).

The reference ships tiny `data/sample_data` files per model for smoke runs
(SURVEY §4.1).  We generate equivalent data instead of copying it: Criteo-
format lines with a learnable signal (label correlates with a linear score
of the sampled ids) so smoke tests can assert that training reduces loss
and lifts AUC above 0.5.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from paddlerec_tpu.data.schema import SlotSchema


def synthetic_batch(
    rng: np.random.RandomState,
    batch_size: int,
    num_sparse: int = 26,
    dense_dim: int = 13,
    vocab: int = 1000001,
    learnable: bool = True,
):
    """In-memory synthetic batch in the reader's output format."""
    sparse = rng.randint(1, vocab, size=(batch_size, num_sparse)).astype(np.int64)
    dense = rng.rand(batch_size, dense_dim).astype(np.float32)
    if learnable:
        # Label depends on a fixed pseudo-random per-id weight: hash ids to
        # a score so the mapping is learnable by an embedding model.
        w = ((sparse * 2654435761) % 1000) / 1000.0 - 0.5
        score = w.mean(axis=1) * 8.0 + (dense.mean(axis=1) - 0.5) * 2.0
        prob = 1.0 / (1.0 + np.exp(-score))
        label = (rng.rand(batch_size) < prob).astype(np.float32)
    else:
        label = (rng.rand(batch_size) < 0.5).astype(np.float32)
    return {"label": label, "sparse": sparse, "dense": dense, "mask": np.ones(batch_size, np.float32)}


def write_criteo_sample(
    out_dir: str,
    num_lines: int = 200,
    num_files: int = 2,
    num_sparse: int = 26,
    dense_dim: int = 13,
    vocab: int = 1000001,
    seed: int = 42,
    schema: Optional[SlotSchema] = None,
) -> Sequence[str]:
    """Write Criteo-format sample files: ``click:1 dense_feature:0.05×13 1:id ... 26:id``."""
    schema = schema or SlotSchema.criteo(num_sparse, dense_dim)
    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per_file = max(1, num_lines // num_files)
    for fi in range(num_files):
        path = os.path.join(out_dir, f"part-{fi}")
        with open(path, "w") as f:
            batch = synthetic_batch(rng, per_file, num_sparse, dense_dim, vocab)
            for row in range(per_file):
                tokens = [f"{schema.label_slot}:{int(batch['label'][row])}"]
                for j in range(dense_dim):
                    tokens.append(f"dense_feature:{batch['dense'][row, j]:.6f}")
                for si, name in enumerate(schema.sparse_slots):
                    tokens.append(f"{name}:{int(batch['sparse'][row, si])}")
                f.write(" ".join(tokens) + "\n")
        paths.append(path)
    return paths
