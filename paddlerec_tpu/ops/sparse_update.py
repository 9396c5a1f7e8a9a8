"""Sparse row-wise optimizer for packed embedding tables.

Why: with a dense optimizer every step pays read+write over the FULL
table and both Adam moments — at production vocab (10^7-10^9 rows) that
traffic dominates the step (measured on v5e: DeepFM at vocab 10^7 runs
18.4 ms/step dense vs ~9 ms with the table update removed).  The
reference never pays this either: its PS accessors update only the
features a batch touched (DownpourCtrDymfAccessor,
tools/utils/static_ps/config_fleet.py:60-104).

TPU-native mechanism (all inside one jit, static shapes):

1. the embedding module reads the table through ``stop_gradient`` and
   adds a zero-initialized ``embedding_delta`` param per lookup
   position — autodiff then delivers per-position 128-lane row grads on
   the delta leaf instead of a dense (R, 128) grad table;
2. ``dedup_rows`` sorts the batch's physical row ids into a padded
   unique set (sentinel = num_rows) with a position→slot map;
3. ``rowwise_adam`` gathers table/moment rows for the unique set,
   applies Adam with PER-ROW step counts (lazy-Adam bias correction —
   same semantics as ``train/optimizers.py`` lazy_adam and the
   reference's per-feature accessors), and scatters them back.  Only
   touched rows generate HBM traffic.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def dedup_rows(phys: jnp.ndarray, num_rows: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape unique for physical row ids.

    phys: (N,) int32 row ids in [0, num_rows).
    Returns (uniq (N,), slot (N,)): ``uniq`` holds each distinct row once
    (remaining slots = ``num_rows``, the drop sentinel) and ``slot[i]`` is
    the index of ``phys[i]`` within ``uniq``."""
    n = phys.shape[0]
    order = jnp.argsort(phys)
    s = phys[order]
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]
    )
    pos = jnp.cumsum(is_new) - 1  # slot of each sorted element
    uniq = jnp.full((n,), num_rows, phys.dtype).at[pos].set(s)
    slot = jnp.zeros((n,), jnp.int32).at[order].set(pos.astype(jnp.int32))
    return uniq, slot


class RowwiseAdamState(NamedTuple):
    m: jnp.ndarray      # (R, 128) first moment
    v: jnp.ndarray      # (R, 128) second moment
    count: jnp.ndarray  # (R,) per-row step count (lazy bias correction)


def rowwise_adam_init(table: jnp.ndarray) -> RowwiseAdamState:
    # moments stay float32 even for bf16 tables — bf16 moments round
    # small-gradient contributions to zero (same invariant as the dense
    # optimizer's mu_dtype=float32)
    return RowwiseAdamState(
        m=jnp.zeros(table.shape, jnp.float32),
        v=jnp.zeros(table.shape, jnp.float32),
        count=jnp.zeros((table.shape[0],), jnp.int32),
    )


def rowwise_adam(
    table: jnp.ndarray,
    state: RowwiseAdamState,
    uniq: jnp.ndarray,
    row_grads: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, RowwiseAdamState]:
    """Adam on exactly the ``uniq`` rows (sentinel rows are dropped).

    row_grads: (U, 128) summed gradients aligned with ``uniq``."""
    num_rows = table.shape[0]
    valid = (uniq < num_rows)[:, None]
    safe = jnp.where(uniq < num_rows, uniq, 0)
    # all math in float32: bf16(0.999) == 1.0 would zero the bias
    # correction and silently freeze the table
    g = row_grads.astype(jnp.float32)
    t_r = table[safe].astype(jnp.float32)
    m_r = state.m[safe]
    v_r = state.v[safe]
    c_r = state.count[safe] + 1
    m_n = b1 * m_r + (1.0 - b1) * g
    v_n = b2 * v_r + (1.0 - b2) * g * g
    c_f = c_r.astype(jnp.float32)[:, None]
    m_hat = m_n / (1.0 - b1**c_f)
    v_hat = v_n / (1.0 - b2**c_f)
    t_n = (t_r - lr * m_hat / (jnp.sqrt(v_hat) + eps)).astype(table.dtype)
    t_r = t_r.astype(table.dtype)
    # sentinel (and masked) rows scatter out of bounds → dropped
    idx = jnp.where(valid[:, 0], uniq, num_rows)
    new_table = table.at[idx].set(jnp.where(valid, t_n, t_r), mode="drop")
    return new_table, RowwiseAdamState(
        m=state.m.at[idx].set(jnp.where(valid, m_n, m_r), mode="drop"),
        v=state.v.at[idx].set(jnp.where(valid, v_n, v_r), mode="drop"),
        count=state.count.at[idx].set(
            jnp.where(valid[:, 0], c_r, c_r - 1), mode="drop"
        ),
    )


class RowwiseAdagradState(NamedTuple):
    """Scalar per-row accumulator — the reference sparse accessor's
    layout (DownpourCtrDymfAccessor keeps one g2sum per feature, not per
    element; config_fleet.py:84-104)."""

    acc: jnp.ndarray  # (R,) sum of per-row mean squared grads


def rowwise_adagrad_init(table: jnp.ndarray) -> RowwiseAdagradState:
    return RowwiseAdagradState(
        acc=jnp.zeros((table.shape[0],), jnp.float32)  # never bf16
    )


def apply_sparse_adagrad(
    table: jnp.ndarray,
    state: RowwiseAdagradState,
    delta_grad: jnp.ndarray,
    phys: jnp.ndarray,
    lr: float,
    eps: float = 1e-8,
    rng=None,
) -> Tuple[jnp.ndarray, RowwiseAdagradState]:
    """Sort-free row-wise adagrad: minimum-traffic sparse update.

    HBM ops: one scatter-add (grad sum), two row gathers, one row
    scatter, plus (R,)-sized accumulator traffic — ~4 passes over the
    touched rows instead of 6 full-table passes for dense Adam.
    Duplicate positions write identical values (see
    apply_sparse_update)."""
    n = phys.shape[0]
    phys = phys.astype(jnp.int32)
    g_dense = jnp.zeros(table.shape, jnp.float32).at[phys].add(
        delta_grad[:n].astype(jnp.float32), mode="drop"
    )
    g_r = g_dense[phys]
    a_r = state.acc[phys] + (g_r * g_r).mean(-1)
    t_n = (table[phys].astype(jnp.float32)
           - lr * g_r * jax.lax.rsqrt(a_r + eps)[:, None])
    return (
        table.at[phys].set(_cast_to_table(t_n, table, rng), mode="drop"),
        RowwiseAdagradState(acc=state.acc.at[phys].set(a_r, mode="drop")),
    )


SENTINEL = np.iinfo(np.int32).max  # padded uniq slots; scatter-drop target


def host_dedup(ids, vocab: int, pack: int):
    """Host-side (numpy) dedup of a batch's physical rows — runs in the
    input pipeline, overlapped with device compute.  Returns
    (uniq (N,) int32 padded with SENTINEL, slot (N,) int32)."""
    phys = (np.asarray(ids).reshape(-1) % vocab) // pack
    uniq, slot = np.unique(phys, return_inverse=True)
    out = np.full(phys.size, SENTINEL, np.int32)
    out[: len(uniq)] = uniq
    return out, slot.reshape(-1).astype(np.int32)


def stochastic_round_bf16(x: jnp.ndarray, key) -> jnp.ndarray:
    """float32 → bfloat16 with stochastic rounding.

    Round-to-nearest silently drops updates smaller than ~0.4% of the
    weight's magnitude (bf16 has an 8-bit mantissa), so long runs of
    tiny optimizer steps stall.  Adding a uniform 16-bit value to the
    truncated bits before chopping makes the rounding unbiased: the
    EXPECTED stored value equals the f32 value, so small updates
    accumulate across steps instead of vanishing."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    noise = jax.random.randint(
        key, x.shape, 0, 1 << 16, dtype=jnp.uint32
    )
    rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(
        jnp.bfloat16
    )


def _cast_to_table(t_n: jnp.ndarray, table: jnp.ndarray, rng):
    """f32 update results → table dtype; stochastic rounding for bf16
    when an rng is provided (hyper sparse_update_stochastic_round)."""
    if table.dtype == jnp.bfloat16 and rng is not None:
        return stochastic_round_bf16(t_n, rng)
    return t_n.astype(table.dtype)


def _grad_sum(delta_grad, uniq, slot):
    """Per-unique-row f32 gradient sum (the only place the per-position
    delta grads are merged — compact AND sharded kernels both use it)."""
    n = slot.shape[0]
    return jnp.zeros((uniq.shape[0], 128), jnp.float32).at[slot].add(
        delta_grad[:n].astype(jnp.float32)
    )


def _live_rows(g_uniq, idx, drop_index):
    """Route rows whose summed grad is exactly zero to ``drop_index`` so
    scatter mode='drop' skips them.  Used by the lazy-Adam kernels: a
    zero-grad Adam step still moves the row (momentum decay + bias
    correction), which is wrong for rows that were only *touched*
    (sentinel padding, host-table overflow rows with zeroed grads)."""
    live = jnp.any(g_uniq != 0.0, axis=-1)
    return jnp.where(live, idx, drop_index)


def _compact_grad(table, delta_grad, uniq, slot):
    g_uniq = _grad_sum(delta_grad, uniq, slot)
    safe = jnp.minimum(uniq, table.shape[0] - 1)
    return g_uniq, safe


def apply_sparse_adagrad_compact(
    table: jnp.ndarray,
    state: RowwiseAdagradState,
    delta_grad: jnp.ndarray,
    uniq: jnp.ndarray,
    slot: jnp.ndarray,
    lr: float,
    eps: float = 1e-8,
    rng=None,
) -> Tuple[jnp.ndarray, RowwiseAdagradState]:
    """Row-wise adagrad with HOST-deduped rows: the only O(R) memory is
    the table itself — the grad scratch is (N, 128), so vocab 10^8 fits
    on one chip (dense Adam's 3× table footprint OOMs there)."""
    g_uniq, safe = _compact_grad(table, delta_grad, uniq, slot)
    a_r = state.acc[safe] + (g_uniq * g_uniq).mean(-1)
    t_n = (table[safe].astype(jnp.float32)
           - lr * g_uniq * jax.lax.rsqrt(a_r + eps)[:, None])
    # NOTE: no unique_indices hint — the padding repeats SENTINEL, which
    # would break the all-distinct promise (UB); drop-mode handles it
    return (
        table.at[uniq].set(_cast_to_table(t_n, table, rng), mode="drop"),
        RowwiseAdagradState(acc=state.acc.at[uniq].set(a_r, mode="drop")),
    )


def apply_sparse_adam_compact(
    table: jnp.ndarray,
    state: RowwiseAdamState,
    delta_grad: jnp.ndarray,
    uniq: jnp.ndarray,
    slot: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    rng=None,
) -> Tuple[jnp.ndarray, RowwiseAdamState]:
    """Row-wise Adam with HOST-deduped rows (see adagrad variant).

    Rows whose summed grad is exactly zero (e.g. host-table overflow
    rows whose grads the fetch path zeroed) are routed to the drop
    index: a zero-grad Adam step is NOT a no-op (m decays, count
    increments, the table moves by lr*m_hat from stale momentum), and
    lazy Adam must only step rows that actually received gradient —
    matching the reference accessor's touched-row semantics
    (tools/utils/static_ps/config_fleet.py adam per-feature update)."""
    g_uniq, safe = _compact_grad(table, delta_grad, uniq, slot)
    uniq = _live_rows(g_uniq, uniq, SENTINEL)
    m_n = b1 * state.m[safe] + (1.0 - b1) * g_uniq
    v_n = b2 * state.v[safe] + (1.0 - b2) * g_uniq * g_uniq
    c_r = state.count[safe] + 1
    c_f = c_r.astype(jnp.float32)[:, None]
    t_n = table[safe].astype(jnp.float32) - lr * (
        m_n / (1.0 - b1**c_f)
    ) / (jnp.sqrt(v_n / (1.0 - b2**c_f)) + eps)
    kw = dict(mode="drop")  # no unique hint: SENTINEL padding repeats
    return (
        table.at[uniq].set(_cast_to_table(t_n, table, rng), **kw),
        RowwiseAdamState(
            m=state.m.at[uniq].set(m_n, **kw),
            v=state.v.at[uniq].set(v_n, **kw),
            count=state.count.at[uniq].set(c_r, **kw),
        ),
    )


def _sharded_row_update(mesh, kernel, arrays, row_specs):
    """shard_map a row-wise update kernel over the mesh's mp axis.

    ``arrays`` lead with the mp-sharded table/state (specs from
    ``row_specs``); the trailing replicated operands (grads, uniq, rng
    bits) ride in with P().  Every dp replica computes identical values,
    so the P(mp, ...) outputs are consistent across dp (check_vma off,
    same as the exchange kernels in parallel/embedding.py)."""
    from jax.sharding import PartitionSpec as P

    in_specs = tuple(row_specs) + tuple(
        P() for _ in range(len(arrays) - len(row_specs))
    )
    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=tuple(row_specs),
        check_vma=False,
    )(*arrays)


def _sharded_setup(mesh, table, delta_grad, uniq, slot, rng):
    """Shared preamble of the sparse × mp kernels: local row count,
    merged per-unique grads, and the rng plumbed as concrete bits (a
    None can't cross the shard_map boundary)."""
    from paddlerec_tpu.parallel.mesh import MP_AXIS

    rows_local = table.shape[0] // mesh.shape[MP_AXIS]
    g_uniq = _grad_sum(delta_grad, uniq, slot)
    use_rng = rng is not None
    rngbits = rng if use_rng else jnp.zeros((2,), jnp.uint32)
    return rows_local, g_uniq, use_rng, rngbits


def _owned_rows(uq, rows_local):
    """Inside a sharded kernel: map global physical rows to this shard's
    local rows.  ``loc`` routes non-owned/sentinel entries out of range
    (scatter mode='drop' discards them); ``safe`` clamps them to row 0
    for the gathers (their results are never written back)."""
    from paddlerec_tpu.parallel.mesh import MP_AXIS

    lo = jax.lax.axis_index(MP_AXIS) * rows_local
    owned = (uq >= lo) & (uq < lo + rows_local)
    loc = jnp.where(owned, uq - lo, rows_local)
    safe = jnp.where(owned, uq - lo, 0)
    return loc, safe


def apply_sparse_adagrad_sharded(
    mesh,
    table: jnp.ndarray,
    state: RowwiseAdagradState,
    delta_grad: jnp.ndarray,
    uniq: jnp.ndarray,
    slot: jnp.ndarray,
    lr: float,
    eps: float = 1e-8,
    rng=None,
) -> Tuple[jnp.ndarray, RowwiseAdagradState]:
    """Row-wise adagrad on a P(mp, None)-sharded table.

    The composed sparse_update × model-parallel mode (the reference
    trains 10^10-row tables this way: DownpourSparseTable sharded over
    PS servers with per-feature accessors, config_fleet.py:60-104).
    ``uniq``/``slot`` are the REPLICATED host-deduped global physical
    rows (sentinel-padded); each mp shard masks to the rows it owns
    (global row r lives on shard r // rows_local) and applies the same
    update math as apply_sparse_adagrad_compact to exactly those rows.
    Only touched rows generate table/accumulator traffic — the dense
    optimizer's full-shard traversal never happens.

    Traffic note: each shard gathers the full N-length uniq list (masked
    rows read row 0), so per-chip update traffic matches the single-chip
    compact path rather than N/mp; the win is capacity + the dense
    phases' mp scaling, not the update phase.
    """
    from jax.sharding import PartitionSpec as P

    from paddlerec_tpu.parallel.mesh import MP_AXIS

    rows_local, g_uniq, use_rng, rngbits = _sharded_setup(
        mesh, table, delta_grad, uniq, slot, rng
    )

    def kernel(tl, accl, gu, uq, rb):
        loc, safe = _owned_rows(uq, rows_local)
        a_r = accl[safe] + (gu * gu).mean(-1)
        t_n = (tl[safe].astype(jnp.float32)
               - lr * gu * jax.lax.rsqrt(a_r + eps)[:, None])
        t_c = _cast_to_table(t_n, tl, rb if use_rng else None)
        return (
            tl.at[loc].set(t_c, mode="drop"),
            accl.at[loc].set(a_r, mode="drop"),
        )

    new_table, new_acc = _sharded_row_update(
        mesh, kernel,
        (table, state.acc, g_uniq, uniq, rngbits),
        (P(MP_AXIS, None), P(MP_AXIS)),
    )
    return new_table, RowwiseAdagradState(acc=new_acc)


def apply_sparse_adam_sharded(
    mesh,
    table: jnp.ndarray,
    state: RowwiseAdamState,
    delta_grad: jnp.ndarray,
    uniq: jnp.ndarray,
    slot: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    rng=None,
) -> Tuple[jnp.ndarray, RowwiseAdamState]:
    """Row-wise lazy Adam on a P(mp, None)-sharded table (see the
    adagrad variant for the routing/ownership scheme)."""
    from jax.sharding import PartitionSpec as P

    from paddlerec_tpu.parallel.mesh import MP_AXIS

    rows_local, g_uniq, use_rng, rngbits = _sharded_setup(
        mesh, table, delta_grad, uniq, slot, rng
    )

    def kernel(tl, ml, vl, cl, gu, uq, rb):
        loc, safe = _owned_rows(uq, rows_local)
        # lazy Adam: zero-summed-grad rows (overflow rows whose grads the
        # fetch path zeroed) must not take a momentum-only step
        loc = _live_rows(gu, loc, rows_local)
        m_n = b1 * ml[safe] + (1.0 - b1) * gu
        v_n = b2 * vl[safe] + (1.0 - b2) * gu * gu
        c_r = cl[safe] + 1
        c_f = c_r.astype(jnp.float32)[:, None]
        t_n = tl[safe].astype(jnp.float32) - lr * (
            m_n / (1.0 - b1**c_f)
        ) / (jnp.sqrt(v_n / (1.0 - b2**c_f)) + eps)
        t_c = _cast_to_table(t_n, tl, rb if use_rng else None)
        kw = dict(mode="drop")
        return (
            tl.at[loc].set(t_c, **kw),
            ml.at[loc].set(m_n, **kw),
            vl.at[loc].set(v_n, **kw),
            cl.at[loc].set(c_r, **kw),
        )

    new_table, m, v, count = _sharded_row_update(
        mesh, kernel,
        (table, state.m, state.v, state.count, g_uniq, uniq, rngbits),
        (P(MP_AXIS, None), P(MP_AXIS, None), P(MP_AXIS, None), P(MP_AXIS)),
    )
    return new_table, RowwiseAdamState(m=m, v=v, count=count)


def apply_sparse_update(
    table: jnp.ndarray,
    state: RowwiseAdamState,
    delta_grad: jnp.ndarray,
    phys: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    rng=None,
) -> Tuple[jnp.ndarray, RowwiseAdamState]:
    """Per-position delta grads + physical row ids → row-wise Adam step.

    Sort-free scheme (TPU sorts are slow — a 221k argsort costs more
    than the whole dense step): scatter-add the per-position grads into
    a dense (R, 128) scratch (the same op the dense backward performs),
    then gather/compute/scatter at the RAW position list.  Duplicate
    positions read the same summed grad and therefore write identical
    values, so last-writer-wins scatter is exact; each touched row is
    advanced exactly one Adam step.  Only touched rows generate moment
    and table traffic — the full-table traversal that dominates dense
    Adam at vocab >= 10^7 never happens.

    delta_grad: (C, 128) grads on the embedding_delta param (positions
    beyond the batch's N are zero).
    phys: (N,) physical row per lookup position, N <= C."""
    n = phys.shape[0]
    phys = phys.astype(jnp.int32)
    g_dense = jnp.zeros(table.shape, jnp.float32).at[phys].add(
        delta_grad[:n].astype(jnp.float32), mode="drop"
    )
    g_r = g_dense[phys]
    t_r = table[phys].astype(jnp.float32)
    m_r = state.m[phys]
    v_r = state.v[phys]
    c_r = state.count[phys] + 1
    m_n = b1 * m_r + (1.0 - b1) * g_r
    v_n = b2 * v_r + (1.0 - b2) * g_r * g_r
    c_f = c_r.astype(jnp.float32)[:, None]
    m_hat = m_n / (1.0 - b1**c_f)
    v_hat = v_n / (1.0 - b2**c_f)
    t_n = t_r - lr * m_hat / (jnp.sqrt(v_hat) + eps)
    # lazy Adam: positions whose summed grad is exactly zero take no step
    phys = _live_rows(g_r, phys, table.shape[0])
    return (
        table.at[phys].set(_cast_to_table(t_n, table, rng), mode="drop"),
        RowwiseAdamState(
            m=state.m.at[phys].set(m_n, mode="drop"),
            v=state.v.at[phys].set(v_n, mode="drop"),
            count=state.count.at[phys].set(c_r, mode="drop"),
        ),
    )


def infer_pack(vocab: int, rows: int, mp: int = 1) -> int:
    """Recover the pack factor of a packed (rows, 128) table from its row
    count (same trick as tools/export_cube.py's width inference).

    mp > 1 matches the sharded-engine geometry, whose row count is
    padded up to an mp multiple (parallel/embedding.py ShardedEmbedding)."""
    for w in (8, 16, 32, 64, 128):
        pack = 128 // w
        base = (vocab + pack - 1) // pack
        if mp > 1:
            base = -(-base // mp) * mp
        if base == rows:
            return pack
    raise ValueError(
        f"no pack factor maps vocab {vocab} to {rows} rows (mp={mp})"
    )


def find_sparse_taps(params: Any) -> Dict[Tuple, Tuple]:
    """Map delta-param paths → sibling table paths in a params tree.

    The external-update SlotEmbedding stores ``embedding_delta`` next to
    its ``embedding`` table; both live under the same module scope."""
    from paddlerec_tpu.ops.embedding import EMBEDDING_PARAM_NAME

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = {tuple(k.key for k in p): None for p, _ in flat}
    taps = {}
    for p in paths:
        if p and p[-1] == "embedding_delta":
            table = p[:-1] + (EMBEDDING_PARAM_NAME,)
            if table in paths:
                taps[p] = table
    return taps


def get_path(tree: Any, path: Tuple):
    node = tree
    for k in path:
        node = node[k]
    return node


def set_path(tree: Any, path: Tuple, value: Any) -> Any:
    """Functionally replace the leaf at ``path`` (dict pytrees)."""
    if not path:
        return value
    node = dict(tree)
    node[path[0]] = set_path(tree[path[0]], path[1:], value)
    return node
