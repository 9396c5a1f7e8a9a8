"""Embedding ops: shared sparse table + pooled lookup.

Reference behavior being rebuilt:
  * one big sparse table shared across all slots
    (models/rank/dnn/net.py:72-77 `paddle.static.nn.sparse_embedding`,
    vocab = hyper_parameters.sparse_feature_number);
  * sum-pooling of per-slot multi-hot ids into one vector per slot.

TPU-native design: tables live in HBM in the *packed 128-lane layout* of
``ops/packed_embedding.py`` (measured 2.5-3.7× faster backward scatter at
equal memory), row-sharded over the mesh's ``mp`` axis for tables too big
for one chip.  The explicit all_to_all exchange (the PS replacement) lives
in ``paddlerec_tpu/parallel/embedding.py``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

import contextlib

from numpy import prod as np_prod

from paddlerec_tpu.ops.packed_embedding import init_packed_table, packed_lookup

# Param names with this prefix get row-sharded over the model axis (see
# paddlerec_tpu/parallel/sharding.py).
EMBEDDING_PARAM_NAME = "embedding"

# trace-time defaults: CTRModelDef wraps init/apply in
# slot_embedding_context so EVERY SlotEmbedding-based model honors
# hyper_parameters.{sparse_update,sparse_feature_dtype} without
# per-module attribute plumbing.  Explicit module attrs always win.
_CTX: dict = {}

# (vocab, dim) pairs whose explicit distributed=True was downgraded by the
# MIN_ROWS_TO_SHARD floor — warn once per geometry, not per trace.
_DOWNGRADE_WARNED: set = set()


@contextlib.contextmanager
def slot_embedding_context(**kw):
    global _CTX
    old = _CTX
    _CTX = {**old, **{k: v for k, v in kw.items() if v is not None}}
    try:
        yield
    finally:
        _CTX = old


class SlotEmbedding(nn.Module):
    """Shared embedding table over all sparse slots.

    Input ids: (B, S) one id per slot, or (B, S, L) multi-hot with optional
    (B, S, L) mask; output: (B, S, E) per-slot pooled vectors.

    Attributes:
      vocab_size: number of rows (sparse_feature_number).
      embedding_dim: vector width (sparse_feature_dim).
      combiner: 'sum' | 'mean' pooling over the L axis.
      hash_ids: apply `ids mod vocab_size` — the safety net the reference
        gets from string-hash preprocessing (tools/dataset/parser.cpp:36-78).
      packed: use the packed 128-lane table layout (fast path).
      distributed: None = auto (row-shard the table over the mesh's mp axis
        via the all_to_all engine whenever the active parallel context has
        mp > 1); False forces local.  True requests sharding but is still
        subject to the MIN_ROWS_TO_SHARD floor — tables whose packed row
        count is below it fall back to the local replicated path (with a
        one-time warning), and the fallback changes the param geometry, so
        checkpoints do not transfer across the threshold.  The reference's
        analog is the `distributed_embedding`/`sparse_embedding` switch
        (models/rank/dnn/net.py:70-84).
    """

    vocab_size: int
    embedding_dim: int
    combiner: str = "sum"
    hash_ids: bool = True
    packed: bool = True
    distributed: Optional[bool] = None
    # None = fall back to the active slot_embedding_context (then f32)
    param_dtype: Optional[jnp.dtype] = None
    init_stddev: float = 1e-2
    # external (sparse) update mode: the table is read through
    # stop_gradient and a zero "embedding_delta" param taps per-position
    # row grads, so the optimizer can update ONLY touched rows
    # (ops/sparse_update.py).  delta_capacity bounds positions per batch
    # and MUST be set explicitly (ModelDef.sparse_embed_kwargs does).
    external_update: Optional[bool] = None
    delta_capacity: Optional[int] = None

    def _resolved(self):
        """(external_update, delta_capacity, param_dtype) with context
        fallbacks — explicit attrs win."""
        ext = (self.external_update if self.external_update is not None
               else _CTX.get("external_update", False))
        cap = (self.delta_capacity if self.delta_capacity is not None
               else _CTX.get("delta_capacity", 0))
        dtype = (self.param_dtype if self.param_dtype is not None
                 else _CTX.get("param_dtype", jnp.float32))
        return bool(ext), int(cap), dtype

    def _use_distributed(self) -> bool:
        from paddlerec_tpu.parallel import context

        if self.distributed is not None:
            want = self.distributed and context.get_mesh() is not None
        else:
            want = self.packed and context.model_parallel_size() > 1
        if not want:
            return False
        # Align with parallel.sharding.param_spec's MIN_ROWS_TO_SHARD:
        # tables too small for param_spec to row-shard must NOT use the
        # engine either — the engine pads the row count to an mp
        # multiple, and a padded-but-replicated table would then route
        # to the non-mp sparse path whose infer_pack expects the exact
        # ceil(vocab/pack) geometry (trace-time ValueError).  Below the
        # threshold the local packed lookup over the replicated table is
        # both correct and faster (no all_to_all for tiny tables).
        from paddlerec_tpu.ops.packed_embedding import sub_width
        from paddlerec_tpu.parallel.sharding import MIN_ROWS_TO_SHARD

        pack = 128 // sub_width(self.embedding_dim)
        rows = -(-self.vocab_size // pack)
        if rows < MIN_ROWS_TO_SHARD:
            if self.distributed is True:
                key = (self.vocab_size, self.embedding_dim)
                if key not in _DOWNGRADE_WARNED:
                    _DOWNGRADE_WARNED.add(key)
                    import logging

                    logging.getLogger(__name__).warning(
                        "SlotEmbedding(distributed=True, vocab=%d, dim=%d):"
                        " %d packed rows < MIN_ROWS_TO_SHARD=%d — falling"
                        " back to the local replicated table (different"
                        " param geometry than the sharded engine).",
                        self.vocab_size, self.embedding_dim, rows,
                        MIN_ROWS_TO_SHARD,
                    )
            return False
        return True

    @staticmethod
    def _check_delta_capacity(n: int, cap: int) -> None:
        if cap <= 0:
            raise ValueError(
                "external_update requires an explicit delta_capacity "
                "(params are initialized from a tiny example batch, so "
                "sizing from the first batch cannot work; "
                "ModelDef.sparse_embed_kwargs computes the right value)"
            )
        if n > cap:
            raise ValueError(
                f"batch has {n} lookup positions > delta_capacity {cap}; "
                "raise hyper_parameters.sparse_update_capacity"
            )

    def _external_lookup(self, table: jnp.ndarray, ids: jnp.ndarray,
                         cap: int) -> jnp.ndarray:
        """Sparse-update path: stop-grad table read + delta grad tap.

        Math is identical to packed_lookup; only the autodiff routing
        differs — grads land on the (C, 128) delta instead of a dense
        (R, 128) table grad.  The trainer turns the delta grads into a
        row-wise optimizer step (ops/sparse_update.py) and the delta
        itself stays zero forever (its optax label is set_to_zero)."""
        from paddlerec_tpu.ops.packed_embedding import sub_width

        w = sub_width(self.embedding_dim)
        pack = 128 // w
        n = int(np_prod(ids.shape))
        self._check_delta_capacity(n, cap)
        # delta (and therefore the tapped grads) stays float32 even for
        # bf16 tables — bf16 per-position grads would truncate before
        # the row-sum
        delta = self.param(
            "embedding_delta", nn.initializers.zeros, (cap, 128),
            jnp.float32,
        )
        phys = (ids // pack).astype(jnp.int32)
        sub = (ids % pack).astype(jnp.int32)
        rows = jnp.take(
            jax.lax.stop_gradient(table), phys, axis=0, mode="clip"
        ).reshape(-1, 128) + delta[:n]
        rows = rows.reshape(ids.shape + (pack, w))
        if pack == 1:
            vecs = rows[..., 0, :]
        else:
            onehot = (
                jax.lax.broadcasted_iota(
                    jnp.int32, ids.shape + (pack,), ids.ndim
                )
                == sub[..., None]
            )
            vecs = jnp.sum(rows * onehot[..., None].astype(rows.dtype), -2)
        return vecs[..., : self.embedding_dim]

    @nn.compact
    def __call__(
        self, ids: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        ext, cap, dtype = self._resolved()
        if self.hash_ids:
            ids = ids % self.vocab_size
        ids = ids.astype(jnp.int32)
        if ext and not self.hash_ids:
            raise ValueError(
                "external_update requires hash_ids=True: the optimizer-"
                "side row mapping mirrors the ids %% vocab hash"
            )
        if self._use_distributed():
            from paddlerec_tpu.parallel import context
            from paddlerec_tpu.parallel.embedding import get_engine

            eng = get_engine(
                context.get_mesh(),
                self.vocab_size,
                self.embedding_dim,
                dtype=dtype,
            )
            table = self.param(
                EMBEDDING_PARAM_NAME,
                lambda key: jax.random.normal(
                    key, (eng.rows, 128), dtype
                )
                * jnp.asarray(self.init_stddev, dtype),
            )
            flat_ids = ids.reshape(ids.shape[0], -1)
            if ext:
                # composed sparse_update × mp: the delta grad tap rides
                # the all_to_all exchange (lookup_external); the trainer
                # applies a shard-local row-wise optimizer step
                # (ops/sparse_update.apply_sparse_*_sharded).  This is
                # the reference's production regime — per-feature
                # accessors over PS-sharded tables
                # (config_fleet.py:60-104) — for vocabularies past both
                # the single-chip HBM bound and the dense-mp bound.
                n = int(np_prod(ids.shape))
                self._check_delta_capacity(n, cap)
                delta = self.param(
                    "embedding_delta", nn.initializers.zeros, (cap, 128),
                    jnp.float32,
                )
                vecs, overflow = eng.lookup_external(table, delta, flat_ids)
            else:
                vecs, overflow = eng.lookup_with_overflow(table, flat_ids)
            # in-graph overflow observability (works on ANY mesh, incl.
            # multi-host where host-side probing cannot read the counts):
            # the trainer accumulates this into the metric bundle
            self.sow(
                "intermediates", "embedding_overflow",
                jnp.sum(overflow).astype(jnp.int32),
            )
            vecs = vecs.reshape(ids.shape + (self.embedding_dim,))
        elif self.packed:
            table = self.param(
                EMBEDDING_PARAM_NAME,
                lambda key: init_packed_table(
                    key,
                    self.vocab_size,
                    self.embedding_dim,
                    stddev=self.init_stddev,
                    dtype=dtype,
                ),
            )
            if ext:
                vecs = self._external_lookup(table, ids, cap)
            else:
                vecs = packed_lookup(table, ids, self.embedding_dim)
        else:
            table = self.param(
                EMBEDDING_PARAM_NAME,
                nn.initializers.normal(stddev=self.init_stddev),
                (self.vocab_size, self.embedding_dim),
                dtype,
            )
            vecs = jnp.take(table, ids, axis=0, mode="clip")
        if ids.ndim == 2:  # (B, S) → (B, S, E)
            return vecs
        # (B, S, L, E) → pooled (B, S, E)
        if mask is not None:
            vecs = vecs * mask[..., None]
        pooled = vecs.sum(axis=2)
        if self.combiner == "mean":
            denom = (
                mask.sum(axis=2, keepdims=False)[..., None]
                if mask is not None
                else jnp.full(pooled.shape[:-1] + (1,), ids.shape[2], pooled.dtype)
            )
            pooled = pooled / jnp.maximum(denom, 1.0)
        return pooled
