"""Vector index helpers — the Milvus tooling analog.

Parity target: reference recserving/milvus_tool/{milvus_insert,
milvus_recall,milvus_helper}.py — insert item vectors into an ANN
collection and recall top-k for a user vector.  The TPU-era default is
an EXACT index: one MXU matmul + top_k over the (replicated or sharded)
item matrix is faster than an ANN round trip until the catalog is very
large; the interface matches so a real ANN backend can slot in.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class VectorIndex:
    """milvus_insert.VecToMilvus / milvus_recall.RecallByMilvus analog."""

    def __init__(self, metric: str = "ip"):
        assert metric in ("ip", "l2", "cosine")
        self.metric = metric
        self._vectors: Optional[np.ndarray] = None
        self._ids: List[int] = []
        self._device_matrix = None  # cached device copy, reset on insert

    # -- insert (milvus_insert.py) -----------------------------------------
    def insert(self, vectors: Sequence[Sequence[float]],
               ids: Optional[Sequence[int]] = None):
        vecs = np.asarray(vectors, np.float32)
        if ids is None:
            ids = list(range(len(self._ids),
                             len(self._ids) + len(vecs)))
        self._ids.extend(int(i) for i in ids)
        self._vectors = (
            vecs if self._vectors is None
            else np.concatenate([self._vectors, vecs])
        )
        self._device_matrix = None  # invalidate the cached device copy
        return list(ids)

    def __len__(self):
        return len(self._ids)

    # -- search (milvus_recall.py) ------------------------------------------
    def search(self, queries, topk: int = 10
               ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores (Q, k), ids (Q, k))."""
        assert self._vectors is not None and len(self._ids) > 0
        q = jnp.asarray(np.asarray(queries, np.float32))
        if self._device_matrix is None:
            # upload the catalog once; per-query re-upload dominated
            # serving latency for large catalogs
            self._device_matrix = jnp.asarray(self._vectors)
        m = self._device_matrix
        if self.metric == "cosine":
            q = q * jax.lax.rsqrt((q**2).sum(-1, keepdims=True) + 1e-12)
            m = m * jax.lax.rsqrt((m**2).sum(-1, keepdims=True) + 1e-12)
            scores = q @ m.T
        elif self.metric == "ip":
            scores = q @ m.T
        else:  # l2: negative distance so top_k = nearest
            scores = -(
                (q**2).sum(-1, keepdims=True)
                - 2 * q @ m.T
                + (m**2).sum(-1)[None]
            )
        k = min(topk, m.shape[0])
        vals, idx = jax.lax.top_k(scores, k)
        ids = np.asarray(self._ids)[np.asarray(idx)]
        return np.asarray(vals), ids

    # -- persistence ------------------------------------------------------------
    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        npz = path if path.endswith(".npz") else path + ".npz"
        np.savez(npz, vectors=self._vectors,
                 ids=np.asarray(self._ids, np.int64))
        with open(npz + ".meta.json", "w") as f:
            json.dump({"metric": self.metric}, f)

    @classmethod
    def load(cls, path: str) -> "VectorIndex":
        npz = path if path.endswith(".npz") else path + ".npz"
        z = np.load(npz)
        with open(npz + ".meta.json") as f:
            meta = json.load(f)
        idx = cls(meta["metric"])
        idx.insert(z["vectors"], z["ids"].tolist())
        return idx
