"""Host-tiered embedding table — the GPUBox / HeterPS analog.

Parity target: the reference's GPU parameter server keeps the full
sparse table in host memory (and SSD) and builds a per-pass HBM cache of
exactly the rows that pass touches (``PSGPU.begin_pass/end_pass``,
reference tools/static_gpubox_trainer.py:153-159,207,244; SSD tier
config tools/utils/static_ps/config_fleet.py:122-125).

TPU-native shape of the same idea:

- the FULL table lives in host RAM as numpy (rows materialize lazily —
  untouched ids cost nothing beyond a bool bitmask);
- ``begin_pass(ids)`` uniques the pass's ids, seeds any never-seen rows,
  and uploads one dense ``(U, D)`` cache array to HBM — a single bulk
  transfer instead of per-step host lookups;
- during the pass every batch translates global ids → cache slots on
  the host (sorted-array searchsorted, no device sync) and the jitted
  step gathers/updates ONLY the cache, so the optimizer runs at HBM
  speed on a dense array (static shapes, MXU-friendly);
- ``end_pass(cache)`` scatters the trained rows back to host storage.

Feature lifecycle (the CtrAccessor show-decay / eviction analog,
config_fleet.py:60-104) piggybacks on the same host arrays: ``observe``
counts are decayed by ``end_day`` and ``shrink`` frees cold rows.

Optimizer note (measured on a v5e chip): with production batch sizes a
mean-reduced loss yields per-element grads ~1e-5, and optax adagrad's
default ``initial_accumulator_value=0.1`` swamps them — the cache never
moves.  Use the CTR-standard ``optax.adagrad(lr,
initial_accumulator_value=1e-8)`` (matches the reference's sparse
accessor defaults) or a sum-reduced loss.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class HostTieredTable:
    """Full sparse table in host RAM + per-pass dense HBM cache."""

    def __init__(self, vocab: int, dim: int, seed: int = 0,
                 init_scale: Optional[float] = None,
                 show_decay: float = 0.98):
        self.vocab = int(vocab)
        self.dim = int(dim)
        self.seed = int(seed)
        self.init_scale = (
            float(init_scale) if init_scale is not None
            else 1.0 / np.sqrt(dim)
        )
        self.show_decay = float(show_decay)
        # np.zeros is virtual memory — untouched rows are never paged in
        self._table = np.zeros((self.vocab, self.dim), np.float32)
        self._initialized = np.zeros(self.vocab, bool)
        self._shows = np.zeros(self.vocab, np.float32)
        self._pass_ids: Optional[np.ndarray] = None  # sorted unique ids

    # -- storage ------------------------------------------------------------
    def _materialize(self, ids: np.ndarray) -> None:
        fresh = ids[~self._initialized[ids]]
        if len(fresh):
            # vectorized counter-based init (deterministic per (seed, id)):
            # splitmix64 of (seed, id, column) → uniform → Box-Muller.
            # A per-row RandomState loop costs minutes at 10^7 fresh rows.
            def _splitmix64(x: np.ndarray) -> np.ndarray:
                x = (x + np.uint64(0x9E3779B97F4A7C15))
                x = (x ^ (x >> np.uint64(30))) * np.uint64(
                    0xBF58476D1CE4E5B9)
                x = (x ^ (x >> np.uint64(27))) * np.uint64(
                    0x94D049BB133111EB)
                return x ^ (x >> np.uint64(31))

            with np.errstate(over="ignore"):
                base = (np.uint64(self.seed) * np.uint64(1_000_003)
                        + fresh.astype(np.uint64))[:, None]
                cols = np.arange(2 * ((self.dim + 1) // 2),
                                 dtype=np.uint64)[None, :]
                bits = _splitmix64(base * np.uint64(2**32 + 1) + cols)
            u = (bits >> np.uint64(11)).astype(np.float64) / float(2**53)
            u = np.clip(u, 1e-12, 1.0 - 1e-12)
            u1, u2 = u[:, 0::2], u[:, 1::2]
            z = np.concatenate(
                [np.sqrt(-2 * np.log(u1)) * np.cos(2 * np.pi * u2),
                 np.sqrt(-2 * np.log(u1)) * np.sin(2 * np.pi * u2)],
                axis=1,
            )[:, : self.dim]
            self._table[fresh] = (z * self.init_scale).astype(np.float32)
            self._initialized[fresh] = True

    @property
    def rows_resident(self) -> int:
        return int(self._initialized.sum())

    # -- pass protocol (PSGPU.begin_pass/end_pass) ---------------------------
    def begin_pass(self, ids) -> jnp.ndarray:
        """Unique the pass's ids, init fresh rows, upload the HBM cache.

        Returns the dense ``(U, D)`` cache; keep it in your train state
        (it IS the trainable embedding for this pass)."""
        ids = np.unique(np.asarray(ids, np.int64).reshape(-1))
        if ids.size and (ids[0] < 0 or ids[-1] >= self.vocab):
            raise ValueError(
                f"ids out of range [0, {self.vocab}): "
                f"min={ids[0]}, max={ids[-1]}"
            )
        self._materialize(ids)
        self._shows[ids] += 1.0
        self._pass_ids = ids
        return jnp.asarray(self._table[ids])

    def translate(self, ids) -> np.ndarray:
        """Global ids → cache slot indices (host-side, no device sync).

        Ids that were not declared in ``begin_pass`` raise — the same
        contract as the reference's pass-build (a pass trains only on
        the data used to build it)."""
        if self._pass_ids is None:
            raise RuntimeError("translate() before begin_pass()")
        ids = np.asarray(ids, np.int64)
        if len(self._pass_ids) == 0:
            raise KeyError(
                f"ids not in the current pass (the pass is empty; first "
                f"few requested: {ids.reshape(-1)[:5].tolist()})"
            )
        slots = np.searchsorted(self._pass_ids, ids.reshape(-1))
        slots = np.clip(slots, 0, max(len(self._pass_ids) - 1, 0))
        if not np.array_equal(self._pass_ids[slots], ids.reshape(-1)):
            missing = ids.reshape(-1)[self._pass_ids[slots]
                                      != ids.reshape(-1)]
            raise KeyError(
                f"ids not in the current pass (first few: "
                f"{missing[:5].tolist()}); call begin_pass with all ids "
                f"the pass will touch"
            )
        return slots.reshape(ids.shape).astype(np.int32)

    def end_pass(self, cache) -> None:
        """Flush the trained cache rows back to host storage."""
        if self._pass_ids is None:
            raise RuntimeError("end_pass() before begin_pass()")
        cache = np.asarray(cache, np.float32)
        if cache.shape != (len(self._pass_ids), self.dim):
            raise ValueError(
                f"cache shape {cache.shape} != "
                f"({len(self._pass_ids)}, {self.dim})"
            )
        self._table[self._pass_ids] = cache
        self._pass_ids = None

    # -- feature lifecycle (CtrAccessor analog) -------------------------------
    def end_day(self) -> None:
        """Decay show counts (config_fleet.py show_click_decay_rate)."""
        self._shows *= self.show_decay

    def shrink(self, threshold: float = 0.5) -> int:
        """Evict rows whose decayed show count fell below ``threshold``:
        free the storage and let the row re-init on next touch
        (DownpourSparseTable delete_threshold analog).  Returns the
        number of evicted rows."""
        cold = self._initialized & (self._shows < threshold)
        n = int(cold.sum())
        if n:
            self._table[cold] = 0.0
            self._initialized[cold] = False
            self._shows[cold] = 0.0
        return n

    # -- convenience ----------------------------------------------------------
    def lookup_host(self, ids) -> np.ndarray:
        """Serving-style host read (no pass required); missing rows are
        zeros, matching the cube KV miss contract."""
        ids = np.asarray(ids, np.int64).reshape(-1)
        out = self._table[np.clip(ids, 0, self.vocab - 1)].copy()
        out[(ids < 0) | (ids >= self.vocab)] = 0.0
        return out


def pass_train_loop(table: HostTieredTable, batches, step_fn, opt_update,
                    opt_state, cache: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, object]:
    """Reference loop shape for one pass: every batch gathers from the
    HBM cache by slot, ``step_fn`` returns the cache gradient, and the
    optimizer advances the cache in place (donated).  Call
    ``table.end_pass(cache)`` afterwards to persist."""
    for batch in batches:
        slots = table.translate(batch["ids"])
        grad = step_fn(cache, dict(batch, slots=jnp.asarray(slots)))
        updates, opt_state = opt_update(grad, opt_state, cache)
        cache = jax.tree.map(lambda c, u: c + u, cache, updates)
    return cache, opt_state
