"""Sharding rules: which param goes where on the mesh.

Replaces the reference's PS table placement (`config_fleet.py` sparse table
shard_num, `sparse_embedding` remote tables): any parameter whose path ends
in an embedding-table name and whose row count crosses a threshold is
row-sharded ``P(MP_AXIS, None)``; everything else (dense towers, biases) is
replicated and data-parallel gradients are psum'd by XLA.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from paddlerec_tpu.ops.embedding import EMBEDDING_PARAM_NAME
from paddlerec_tpu.parallel.mesh import DP_AXIS, MP_AXIS

# tables smaller than this stay replicated (collectives would cost more
# than the memory saved)
MIN_ROWS_TO_SHARD = 8192


def is_embedding_path(path) -> bool:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    if names and str(names[-1]) == "embedding_delta":
        # per-position grad tap (sparse_update) — batch-shaped scratch,
        # not a table: stays replicated so its grads psum over dp and
        # feed the shard-local row-wise update whole
        return False
    return any(
        str(n) in (EMBEDDING_PARAM_NAME, "sparse_w") for n in names
    )


def param_spec(path, leaf, mp_size: int) -> P:
    if (
        mp_size > 1
        and hasattr(leaf, "ndim")
        and leaf.ndim >= 1
        and leaf.shape[0] >= MIN_ROWS_TO_SHARD
        and leaf.shape[0] % mp_size == 0
        and is_embedding_path(path)
    ):
        return P(MP_AXIS, *([None] * (leaf.ndim - 1)))
    return P()


def param_shardings(params: Any, mesh: Mesh):
    """NamedSharding pytree for a params pytree."""
    mp_size = mesh.shape[MP_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, mp_size)),
        params,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches are split along dp on their leading axis."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
