"""Sharded embedding engine: row-sharded tables + all_to_all id exchange.

This is the TPU-native replacement for the reference's parameter-server
sparse tables (P6/P7 in SURVEY §2.5):

  reference                                  this engine
  ---------                                  -----------
  DownpourSparseTable sharded over PS        packed (R,128) table sharded
  servers (config_fleet.py shard_num)        P(mp, None) over the mesh in HBM
  worker→server pull RPC per batch           all_to_all(ids) over ICI
  server→worker embedding response           all_to_all(vectors) back
  async push of gradients                    reverse all_to_all + scatter-add,
                                             psum over dp (synchronous step)

Routing algorithm (static shapes, XLA-friendly — "hard part (a)" of
SURVEY §7): each device sorts its ids by owning shard, packs them into
per-shard buckets of static capacity C = ceil(N/mp · capacity_factor),
exchanges buckets with one tiled all_to_all, answers lookups locally, and
reverses the exchange.  Bucket overflow (statistically negligible for
hashed ids at the default factor) falls back to zero vectors and dropped
gradients; the overflow count is exposed for monitoring.

Everything runs inside one jit: shard_map for the exchange, custom_vjp so
the backward pass reuses the same routing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from paddlerec_tpu.ops.packed_embedding import sub_width
from paddlerec_tpu.parallel.mesh import DP_AXIS, MP_AXIS


def bucket_capacity(num_local_ids: int, mp: int, capacity_factor: float) -> int:
    """Static per-shard bucket size, rounded up to a sublane multiple."""
    c = int(np.ceil(num_local_ids / mp * capacity_factor))
    return max(8, -(-c // 8) * 8)


def _dedup_ids(phys: jnp.ndarray, sentinel: int):
    """Sort-based static-shape unique.

    Returns (uniq, rank, order): ``uniq`` (N,) holds each distinct id once
    (tail padded with ``sentinel``); ``rank[i]`` is the index into ``uniq``
    of the i-th *sorted* id; ``order`` sorts the original ids.
    Deduplication keeps hot ids from overflowing exchange buckets and sends
    each distinct id over ICI once (SURVEY §7 hard parts (a)/(b)).
    """
    n = phys.shape[0]
    order = jnp.argsort(phys)
    sorted_phys = jnp.take(phys, order, axis=0, mode="clip")
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_phys[1:] != sorted_phys[:-1]]
    )
    rank = jnp.cumsum(first).astype(jnp.int32) - 1  # (N,) unique index
    uniq = jnp.full((n,), sentinel, phys.dtype)
    uniq = uniq.at[jnp.where(first, rank, n)].set(sorted_phys, mode="drop")
    return uniq, rank, order


def _route_ids(phys: jnp.ndarray, mp: int, rows_local: int, capacity: int):
    """Sort physical rows by owning shard and pack into static buckets.

    phys: (N,) physical row indices (global); entries >= mp*rows_local are
    invalid padding and are never routed.
    Returns:
      send:      (mp, capacity) local row indices on the owner, -1 = hole
      slot_of:   (N,) flat bucket slot of each id (-1 if overflow/invalid)
      overflow:  () int32 count of dropped valid ids
    """
    n = phys.shape[0]
    rows_global = mp * rows_local
    valid = phys < rows_global
    shard_of = jnp.where(valid, phys // rows_local, mp)  # invalid sorts last
    order = jnp.argsort(shard_of)
    sorted_shard = jnp.take(shard_of, order, axis=0, mode="clip")
    sorted_local = jnp.take(phys % rows_local, order, axis=0, mode="clip")
    sorted_valid = sorted_shard < mp
    # position of each sorted id within its shard group
    idx = jnp.arange(n, dtype=jnp.int32)
    group_start = jnp.searchsorted(
        sorted_shard, jnp.arange(mp, dtype=shard_of.dtype)
    )
    pos_in_group = idx - group_start[jnp.minimum(sorted_shard, mp - 1)]
    ok = sorted_valid & (pos_in_group < capacity)
    slot_sorted = jnp.where(ok, sorted_shard * capacity + pos_in_group, -1)
    send = jnp.full((mp * capacity,), -1, jnp.int32)
    send = send.at[jnp.where(ok, slot_sorted, mp * capacity)].set(
        sorted_local.astype(jnp.int32), mode="drop"
    )
    overflow = (sorted_valid & ~ok).sum().astype(jnp.int32)
    # slot in ORIGINAL (pre-sort) position
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    slot = jnp.take(slot_sorted, inv, axis=0, mode="clip")
    return send.reshape(mp, capacity), slot, overflow


def _local_gather(table_local: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """rows: (mp, C) local row ids (-1 holes → zero rows)."""
    valid = rows >= 0
    safe = jnp.where(valid, rows, 0)
    out = jnp.take(table_local, safe.reshape(-1), axis=0, mode="clip")
    return jnp.where(valid.reshape(-1, 1), out, 0.0).reshape(
        rows.shape + (table_local.shape[-1],)
    )


def _make_exchange_fns(mesh: Mesh, mp: int, rows_local: int, capacity: int,
                       lanes: int):
    """Build the shard_map'd forward and backward exchange kernels.

    The flat id list is sharded over BOTH mesh axes — every device routes
    only its slice, so each id/gradient crosses the interconnect exactly
    once (the all_to_all runs within each dp row, over the mp axis).
    """

    sentinel = mp * rows_local  # invalid phys id (sorts past every shard)

    def fwd_kernel(table_local, phys):
        # table_local: (rows_local, lanes); phys: (n_dev,) global physical rows
        n = phys.shape[0]
        uniq, rank, order = _dedup_ids(phys, sentinel)
        send, slot, overflow = _route_ids(uniq, mp, rows_local, capacity)
        # exchange id buckets: row k of `send` goes to device k of mp axis
        recv = jax.lax.all_to_all(send, MP_AXIS, 0, 0, tiled=True)  # (mp, C)
        answered = _local_gather(table_local, recv)  # (mp, C, lanes)
        back = jax.lax.all_to_all(answered, MP_AXIS, 0, 0, tiled=True)
        flat = back.reshape(mp * capacity, lanes)
        # vectors per unique id (zeros for overflow/holes)
        uvecs = jnp.where(
            (slot >= 0)[:, None],
            jnp.take(flat, jnp.where(slot >= 0, slot, 0), axis=0, mode="clip"),
            0.0,
        )
        # fan out uniques to every occurrence, then back to original order
        got_sorted = jnp.take(uvecs, rank, axis=0, mode="clip")
        inv = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        vecs = jnp.take(got_sorted, inv, axis=0, mode="clip")
        # per-position fetched flag (False for overflow/invalid): the
        # external (delta-tap) path multiplies it in so dropped positions
        # contribute neither a forward vector nor a delta gradient —
        # bwd_kernel's slot<0 drop is the non-external analog
        ok_sorted = jnp.take((slot >= 0), rank, axis=0, mode="clip")
        fetched = jnp.take(ok_sorted, inv, axis=0, mode="clip")
        return vecs, overflow.reshape(1, 1), fetched

    def bwd_kernel(g, phys):
        # g: (n_dev, lanes) cotangents in original order → segment-sum onto
        # uniques, then route once per distinct id
        n = phys.shape[0]
        uniq, rank, order = _dedup_ids(phys, sentinel)
        send, slot, _ = _route_ids(uniq, mp, rows_local, capacity)
        g_sorted = jnp.take(g, order, axis=0, mode="clip")
        gu = jnp.zeros((n, lanes), g.dtype).at[rank].add(g_sorted)
        gbuf = jnp.zeros((mp * capacity, lanes), g.dtype)
        gbuf = gbuf.at[jnp.where(slot >= 0, slot, mp * capacity)].add(
            gu, mode="drop"
        )
        gbuf = gbuf.reshape(mp, capacity, lanes)
        arrived = jax.lax.all_to_all(gbuf, MP_AXIS, 0, 0, tiled=True)
        recv_rows = jax.lax.all_to_all(send, MP_AXIS, 0, 0, tiled=True)
        valid = recv_rows >= 0
        dtable = jnp.zeros((rows_local, lanes), g.dtype)
        dtable = dtable.at[
            jnp.where(valid, recv_rows, rows_local).reshape(-1)
        ].add(arrived.reshape(-1, lanes), mode="drop")
        # reduce partial table grads across dp rows (disjoint within a row)
        return jax.lax.psum(dtable, DP_AXIS)

    both = (DP_AXIS, MP_AXIS)
    fwd = jax.shard_map(
        fwd_kernel,
        mesh=mesh,
        in_specs=(P(MP_AXIS, None), P(both)),
        out_specs=(P(both), P(both, None), P(both)),
        check_vma=False,
    )
    bwd = jax.shard_map(
        bwd_kernel,
        mesh=mesh,
        in_specs=(P(both), P(both)),
        out_specs=P(MP_AXIS, None),
        check_vma=False,
    )
    return fwd, bwd


@functools.lru_cache(maxsize=64)
def get_engine(
    mesh: Mesh,
    vocab_size: int,
    embedding_dim: int,
    capacity_factor: float = 1.5,
    dtype=jnp.float32,
) -> "ShardedEmbedding":
    """Cached engine per (mesh, table) signature — shard_map closures are
    rebuilt only on a new ids shape."""
    return ShardedEmbedding(
        mesh, vocab_size, embedding_dim,
        capacity_factor=capacity_factor, dtype=dtype,
    )


class ShardedEmbedding:
    """Functional sharded-embedding op bound to a mesh.

    Usage:
        eng = ShardedEmbedding(mesh, vocab_size, embedding_dim)
        table = eng.init(jax.random.PRNGKey(0))      # sharded P(mp, None)
        vecs = eng.lookup(table, ids)                 # ids (B, S) over dp
    ``lookup`` is differentiable w.r.t. the table; the backward pass routes
    gradients with the same all_to_all exchange and psums over dp.
    """

    def __init__(
        self,
        mesh: Mesh,
        vocab_size: int,
        embedding_dim: int,
        capacity_factor: float = 1.5,
        init_stddev: float = 1e-2,
        dtype=jnp.float32,
    ):
        self.mesh = mesh
        self.vocab_size = vocab_size
        self.embedding_dim = embedding_dim
        self.capacity_factor = capacity_factor
        self.init_stddev = init_stddev
        self.dtype = dtype
        self.w = sub_width(embedding_dim)
        self.pack = 128 // self.w
        self.mp = mesh.shape[MP_AXIS]
        self.dp = mesh.shape[DP_AXIS]
        rows = -(-vocab_size // self.pack)
        # pad rows so each shard is equal-sized
        self.rows = -(-rows // self.mp) * self.mp
        self.rows_local = self.rows // self.mp

    # -- params ---------------------------------------------------------------
    def init(self, key) -> jnp.ndarray:
        sharding = NamedSharding(self.mesh, P(MP_AXIS, None))

        def make(k):
            return (
                jax.random.normal(k, (self.rows, 128), self.dtype)
                * self.init_stddev
            )

        return jax.jit(make, out_shardings=sharding)(key)

    # -- lookup ------------------------------------------------------------------
    def lookup(
        self, table: jnp.ndarray, ids: jnp.ndarray
    ) -> jnp.ndarray:
        """ids: (B, S) int — returns (B, S, embedding_dim)."""
        return self._lookup_fn(ids.shape)(table, ids)[0]

    def lookup_with_overflow(self, table, ids):
        """lookup + the per-(dp,mp) overflow counts (differentiable in
        the table; the counts carry no gradient)."""
        return self._lookup_fn(ids.shape)(table, ids)

    def lookup_external(self, table, delta, ids):
        """sparse_update (delta-tap) lookup through the sharded table.

        The table is read via ``stop_gradient`` — autodiff never routes a
        dense (rows, 128) cotangent through the all_to_all exchange —
        and the replicated per-position ``delta`` (cap, 128) is added to
        the gathered rows BEFORE sub-lane selection, exactly mirroring
        ``SlotEmbedding._external_lookup`` on the packed single-chip
        path.  Gradients therefore land on ``delta[:N]`` (one 128-lane
        row per lookup position, psum'd to replicated over dp by GSPMD)
        and the trainer turns them into a shard-local row-wise optimizer
        step (``ops/sparse_update.apply_sparse_*_sharded``).

        Returns (vecs, overflow) like ``lookup_with_overflow``."""
        return self._lookup_ext_fn(ids.shape)(table, delta, ids)

    @functools.lru_cache(maxsize=32)
    def _lookup_fn(self, ids_shape: Tuple[int, ...]):
        return self._build(ids_shape)

    @functools.lru_cache(maxsize=32)
    def _lookup_ext_fn(self, ids_shape: Tuple[int, ...]):
        return self._build_external(ids_shape)

    def _exchange_setup(self, ids_shape):
        """Shared per-ids-shape plumbing: exchange kernels + id math."""
        n_global = int(np.prod(ids_shape))
        n_devices = self.dp * self.mp
        # pad the flat id list so it splits evenly over every device;
        # pad entries use an out-of-range physical row → routed as invalid
        n_padded = -(-n_global // n_devices) * n_devices
        n_dev = n_padded // n_devices
        capacity = bucket_capacity(n_dev, self.mp, self.capacity_factor)
        fwd_x, bwd_x = _make_exchange_fns(
            self.mesh, self.mp, self.rows_local, capacity, 128
        )
        pack = self.pack
        vocab = self.vocab_size
        sentinel = self.rows  # invalid physical row

        def _flat_phys_sub(ids):
            ids = (ids % vocab).astype(jnp.int32)
            flat = ids.reshape(-1)
            phys = flat // pack
            sub = flat % pack
            if n_padded != n_global:
                phys = jnp.concatenate(
                    [phys, jnp.full((n_padded - n_global,), sentinel, jnp.int32)]
                )
            return phys, sub

        return fwd_x, bwd_x, _flat_phys_sub, n_global, n_padded

    def _build(self, ids_shape):
        fwd_x, bwd_x, _flat_phys_sub, n_global, n_padded = (
            self._exchange_setup(ids_shape)
        )
        w, pack, e = self.w, self.pack, self.embedding_dim

        @jax.custom_vjp
        def lookup(table, ids):
            # returns (vecs, overflow): the overflow count rides the
            # normal forward so ANY mesh (incl. multi-host) can
            # accumulate it in-graph — no host-side probing needed.
            return _fwd_impl(table, ids)

        def _fwd_impl(table, ids):
            phys, sub = _flat_phys_sub(ids)
            rows, overflow, _ = fwd_x(table, phys)  # (N',128),(devices,1)
            rows = rows[:n_global].reshape(-1, pack, w)
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (n_global, pack), 1)
                == sub[:, None]
            )
            vecs = jnp.sum(rows * onehot[..., None].astype(rows.dtype), axis=1)
            return vecs[:, :e].reshape(ids_shape + (e,)), overflow

        def fwd(table, ids):
            return _fwd_impl(table, ids), (ids, table)

        def bwd(res, g):
            ids, table = res
            g, _g_overflow = g  # overflow output carries no gradient
            phys, sub = _flat_phys_sub(ids)
            g = g.reshape(-1, e).astype(table.dtype)
            if w != e:
                g = jnp.pad(g, ((0, 0), (0, w - e)))
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (n_global, pack), 1)
                == sub[:, None]
            )
            grows = (onehot[..., None].astype(g.dtype) * g[:, None, :]).reshape(
                -1, 128
            )
            if n_padded != n_global:
                grows = jnp.pad(grows, ((0, n_padded - n_global), (0, 0)))
            dtable = bwd_x(grows, phys)
            return (dtable, None)

        lookup.defvjp(fwd, bwd)
        return lookup

    def _build_external(self, ids_shape):
        """Delta-tap variant: stop-grad table read + differentiable
        per-position delta add (see lookup_external)."""
        fwd_x, _bwd_x, _flat_phys_sub, n_global, _np_ = (
            self._exchange_setup(ids_shape)
        )
        w, pack, e = self.w, self.pack, self.embedding_dim

        def lookup_ext(table, delta, ids):
            phys, sub = _flat_phys_sub(ids)
            rows, overflow, fetched = fwd_x(
                jax.lax.stop_gradient(table), phys
            )
            # delta stays float32 (bf16 per-position grads truncate
            # before the row sum); math upcasts to the delta dtype.
            # Bucket-overflow positions (fetched=False) are zeroed WITH
            # their delta term, so autodiff delivers zero delta grads for
            # rows whose values never entered the forward pass — the
            # row-wise optimizer must not step rows against a zero read
            # (the non-external bwd_kernel drops these grads the same way)
            gate = fetched[:n_global].astype(delta.dtype)[:, None]
            rows = (
                rows[:n_global].astype(delta.dtype) + delta[:n_global]
            ) * gate
            rows = rows.reshape(-1, pack, w)
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (n_global, pack), 1)
                == sub[:, None]
            )
            vecs = jnp.sum(rows * onehot[..., None].astype(rows.dtype), axis=1)
            return vecs[:, :e].reshape(ids_shape + (e,)), overflow

        return lookup_ext
