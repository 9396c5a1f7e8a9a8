"""Pallas TPU kernels for the embedding hot path (experimental, opt-in).

``gather_pool``: fused multi-hot lookup + sum pool.  For (N,) pooled
outputs over L ids each, XLA's take+reduce materializes the gathered
(N·L, 128) rows in HBM before reducing; this kernel DMAs each row
HBM→VMEM once and accumulates in VMEM, writing only the pooled rows —
a bandwidth reduction that grows with L.

Each grid step produces a (BLOCK=8, 128) output tile (the minimum TPU
tile), issuing all 8·L row DMAs before waiting — deep enough pipelining
to hide most of the per-DMA latency.

Honest status (updated after the tunnel's Mosaic remote-compile started
working): the kernel now compiles AND matches XLA numerically on the
real chip (v5e, R=125k, N=8192, L=20: parity True).  Measured in a
chained full-readback loop it runs 5.97 ms vs 1.71 ms for XLA's
take+reduce — per-row 512 B DMA issue cost dominates (N·L = 163k DMAs),
and XLA's batched gather engine is simply stronger on this part.  The
kernel stays OPT-IN as a reference DMA pattern; the (1, B, L) mask
block had to become (1, B, 128) — a small-minor-dim block violates TPU
tiling and aborts the Mosaic compile ("tpu_compile_helper subprocess
exit code 1").
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

    # weighted pool: scratch (B·L, 128) ⊙ mask (1, B, 128-padded L)
    # → (B, 128).  The mask block keeps a 128-lane minor dim (a (1,B,L)
    # block with small L violates TPU tiling and kills the Mosaic
    # compile); only the first L lanes carry weights.
    w = mask_ref[0][:, :pool_l].astype(scratch.dtype)  # (B, L)
    rows = scratch[:].reshape(BLOCK, pool_l, -1)
    out_ref[:] = (rows * w[:, :, None]).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_pool(table, ids, mask, interpret: bool = False):
    """table (R, 128); ids (N, L) physical row ids; mask (N, L) weights
    → pooled (N, 128) = Σ_l table[ids[n,l]] · mask[n,l].
    N must be a multiple of 8 (pad the batch)."""
    n, pool_l = ids.shape
    assert n % BLOCK == 0, f"N={n} must be a multiple of {BLOCK}"
    assert pool_l <= 128, "pool_l > 128: split the pooled axis"
    flat_ids = ids.reshape(-1).astype(jnp.int32)
    # pad the mask's minor dim to a full 128 lanes (tiling requirement)
    mask3 = jnp.zeros((n // BLOCK, BLOCK, 128), jnp.float32)
    mask3 = mask3.at[:, :, :pool_l].set(
        mask.reshape(n // BLOCK, BLOCK, pool_l).astype(jnp.float32)
    )
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
                    (1, BLOCK, 128), lambda g, ids: (g, 0, 0)
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
