"""Pallas TPU kernels for the embedding hot path (experimental, opt-in).

``gather_pool``: fused multi-hot lookup + sum pool.  For (N,) pooled
outputs over L ids each, XLA's take+reduce materializes the gathered
(N·L, 128) rows in HBM before reducing; this kernel DMAs each row
HBM→VMEM once and accumulates in VMEM, writing only the pooled rows —
a bandwidth reduction that grows with L.

Each grid step produces a (BLOCK=8, 128) output tile (the minimum TPU
tile), issuing all 8·L row DMAs before waiting — deep enough pipelining
to hide most of the per-DMA latency.

Honest status: (a) on the current target chip XLA's batched gather is
extremely strong (see ops/packed_embedding.py's A/B record), and (b) the
hardware tunnel's chipless AOT compile helper currently fails to compile
Mosaic kernels at all ("tpu_compile_helper subprocess exit code 1" —
libtpu init env issue in the remote-compile sandbox, not a kernel error;
XLA HLO compiles fine through the same path).  So this kernel is OPT-IN:
correctness is locked by interpreter-mode parity tests on the CPU mesh,
and the on-device A/B belongs to round 2 / direct-attached hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 8  # pooled outputs per grid step (min sublane tile)


def _gather_pool_kernel(ids_ref, table_ref, mask_ref, out_ref, scratch,
                        sems, *, pool_l: int):
    """Grid step g pools ids[(g·B+b)·L + k] into out rows b ∈ [0, B)."""
    g = pl.program_id(0)
    total = BLOCK * pool_l

    def start(j, _):
        rid = ids_ref[g * total + j]
        pltpu.make_async_copy(
            table_ref.at[rid], scratch.at[j], sems.at[j]
        ).start()
        return 0

    jax.lax.fori_loop(0, total, start, 0)

    def wait(j, _):
        rid = ids_ref[g * total + j]
        pltpu.make_async_copy(
            table_ref.at[rid], scratch.at[j], sems.at[j]
        ).wait()
        return 0

    jax.lax.fori_loop(0, total, wait, 0)

    # weighted pool: scratch (B·L, 128) ⊙ mask (1, B, L) → (B, 128)
    w_flat = mask_ref[0].reshape(total).astype(scratch.dtype)
    rows = scratch[:] * w_flat[:, None]
    out_ref[:] = rows.reshape(BLOCK, pool_l, -1).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_pool(table, ids, mask, interpret: bool = False):
    """table (R, 128); ids (N, L) physical row ids; mask (N, L) weights
    → pooled (N, 128) = Σ_l table[ids[n,l]] · mask[n,l].
    N must be a multiple of 8 (pad the batch)."""
    n, pool_l = ids.shape
    assert n % BLOCK == 0, f"N={n} must be a multiple of {BLOCK}"
    flat_ids = ids.reshape(-1).astype(jnp.int32)
    mask3 = mask.reshape(n // BLOCK, BLOCK, pool_l).astype(jnp.float32)
    kernel = functools.partial(_gather_pool_kernel, pool_l=pool_l)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, table.shape[-1]), table.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # ids only
            grid=(n // BLOCK,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # table in HBM
                pl.BlockSpec(  # per-step mask tile in VMEM
                    (1, BLOCK, pool_l), lambda g, ids: (g, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (BLOCK, table.shape[-1]), lambda g, ids: (g, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((BLOCK * pool_l, table.shape[-1]), table.dtype),
                pltpu.SemaphoreType.DMA((BLOCK * pool_l,)),
            ],
        ),
        interpret=interpret,
    )(flat_ids, table, mask3)


def gather_pool_reference(table, ids, mask):
    """jnp reference for parity tests."""
    rows = jnp.take(table, ids.astype(jnp.int32), axis=0, mode="clip")
    return (rows * mask[..., None].astype(table.dtype)).sum(axis=1)
