"""Packed embedding lookup: the TPU-native sparse table layout.

Motivation (measured on v5e, batch 8192×26 ids, vocab 10^6):

  * XLA's gather/scatter throughput depends strongly on the table's lane
    width.  At a logical width of 16 the backward scatter-add runs ~22.8 ms;
    at 128 lanes it runs 6.2 ms, and gather improves to ~39 GB/s.
  * HBM layout is packed (a (V,16) f32 table really is 64 MB), so lane width
    is purely a compute-efficiency knob.

Design: store the table as ``(ceil(V/pack), 128)`` where ``pack = 128 / w``
and ``w`` is the logical embedding dim rounded up to a divisor of 128.  Id
``i`` lives in physical row ``i // pack``, lane window ``(i % pack) * w``.
Gather fetches full 128-lane rows (fast path) and extracts the window with
VPU selects; the backward pass positions gradients into their windows with
a one-hot multiply and issues one 128-lane scatter-add.  Collisions between
different ids sharing a physical row are safe: their windows are disjoint
and scatter-add is associative.

This replaces the reference's PS-side sparse table access
(`paddle.static.nn.sparse_embedding`, models/rank/dnn/net.py:72-77) with an
in-HBM layout tuned for the TensorCore's memory system.

Layout experiments on the target chip (kept for the record; batch 8192×27,
vocab 10^6, measured in the FULL fused train step, not in isolation):
  * flat (V, 16) table + plain take/scatter: isolated gather 2× faster,
    but the full DeepFM step drops 916k → 452k ex/s — the narrow minor dim
    starves the fused backward+optimizer pipeline;
  * (R, 128) param + reshape-view (R·8, 16) gather: isolated fwd+bwd 60×
    faster, full step drops to 406k ex/s — once Adam pins the (R,128)
    tiled layout, the in-graph reshape becomes a physical relayout copy of
    the whole table each direction;
  * this one-hot 128-lane path: 916k ex/s end-to-end.  Isolated op
    microbenchmarks through the device tunnel do NOT predict fused-step
    cost; always A/B the full step.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sub_width(embedding_dim: int) -> int:
    """Smallest divisor of 128 that is >= embedding_dim (8,16,32,64,128)."""
    for w in (8, 16, 32, 64, 128):
        if embedding_dim <= w:
            return w
    raise ValueError(f"embedding_dim {embedding_dim} > 128; use width 128 directly")


def packed_shape(vocab_size: int, embedding_dim: int) -> Tuple[int, int]:
    w = sub_width(embedding_dim)
    pack = 128 // w
    rows = (vocab_size + pack - 1) // pack
    return rows, 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def packed_lookup(table: jnp.ndarray, ids: jnp.ndarray, embedding_dim: int):
    """Lookup ids in a packed (R, 128) table → (..., embedding_dim)."""
    return _packed_lookup_fwd_impl(table, ids, embedding_dim)


def _packed_lookup_fwd_impl(table, ids, embedding_dim):
    w = sub_width(embedding_dim)
    pack = 128 // w
    phys = (ids // pack).astype(jnp.int32)
    sub = (ids % pack).astype(jnp.int32)
    rows = jnp.take(table, phys, axis=0, mode="clip")  # (..., 128)
    rows = rows.reshape(ids.shape + (pack, w))
    if pack == 1:
        vecs = rows[..., 0, :]
    else:
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, ids.shape + (pack,), ids.ndim)
            == sub[..., None]
        )
        vecs = jnp.sum(rows * onehot[..., None].astype(rows.dtype), axis=-2)
    return vecs[..., :embedding_dim]


def _packed_lookup_fwd(table, ids, embedding_dim):
    out = _packed_lookup_fwd_impl(table, ids, embedding_dim)
    # the table is alive as a param anyway; keeping it as a residual costs
    # nothing and carries shape/dtype statically
    return out, (ids, table)


def _packed_lookup_bwd(embedding_dim, res, g):
    ids, table = res
    num_rows, dtype = table.shape[0], table.dtype
    w = sub_width(embedding_dim)
    pack = 128 // w
    phys = (ids // pack).astype(jnp.int32)
    sub = (ids % pack).astype(jnp.int32)
    # place grads into their lane windows: (..., pack, w) one-hot positioned
    g = g.astype(dtype)
    if w != embedding_dim:
        pad = [(0, 0)] * (g.ndim - 1) + [(0, w - embedding_dim)]
        g = jnp.pad(g, pad)
    if pack == 1:
        grows = g
    else:
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, ids.shape + (pack,), ids.ndim)
            == sub[..., None]
        )
        grows = onehot[..., None].astype(dtype) * g[..., None, :]
    grows = grows.reshape(ids.shape + (128,))
    flat_phys = phys.reshape(-1)
    flat_rows = grows.reshape(-1, 128)
    dtable = jnp.zeros((num_rows, 128), dtype).at[flat_phys].add(
        flat_rows, mode="drop"
    )
    return (dtable, None)


packed_lookup.defvjp(_packed_lookup_fwd, _packed_lookup_bwd)


def init_packed_table(
    key, vocab_size: int, embedding_dim: int, stddev: float = 1e-2,
    dtype=jnp.float32,
):
    """Normal-init a packed table (pad lanes are initialized too — harmless:
    they are never read and receive zero gradient)."""
    shape = packed_shape(vocab_size, embedding_dim)
    return jax.random.normal(key, shape, dtype) * stddev


def unpack_table(table: np.ndarray, vocab_size: int, embedding_dim: int) -> np.ndarray:
    """Host-side: packed (R,128) → logical (V, E) (export / tests)."""
    w = sub_width(embedding_dim)
    pack = 128 // w
    flat = np.asarray(table).reshape(table.shape[0] * pack, w)
    return flat[:vocab_size, :embedding_dim]


def pack_table(dense: np.ndarray) -> np.ndarray:
    """Host-side inverse of unpack_table: logical (V, E) → packed (R, 128)."""
    v, e = dense.shape
    w = sub_width(e)
    pack = 128 // w
    rows = (v + pack - 1) // pack
    out = np.zeros((rows * pack, w), dense.dtype)
    out[:v, :e] = dense
    return out.reshape(rows, 128)
