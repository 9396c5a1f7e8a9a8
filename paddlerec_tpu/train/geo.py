"""Geo-SGD: k-step local accumulation with periodic parameter sync.

Parity target: SURVEY §2.5 P4 — the reference's PS-geo mode
(``strategy.a_sync_configs["k_steps"]``,
tools/utils/static_ps/program_helper.py:44-51) trains locally and pushes
parameter DIFFS to the servers every k steps.  On TPU the analog is
local-SGD across DCN-separated slices: each slice steps independently
for ``k_steps``, then all slices average parameters with one collective
— ICI traffic every step, DCN traffic every k.

XLA note: collectives must execute unconditionally across participants,
so the sync is NOT hidden behind ``lax.cond`` — the loop structure is
"scan k local steps, then sync", which is also the efficient shape
(zero DCN traffic inside the scan).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax


def geo_sync(params: Any, axis_name: str) -> Any:
    """Average params across the geo axis (one DCN collective)."""
    return jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), params)


def local_steps_then_sync(
    step_fn: Callable[[Any, Any], Tuple[Any, Any]],
    carry: Any,
    batches: Any,
    axis_name: str,
    params_of: Callable[[Any], Any],
    with_params: Callable[[Any, Any], Any],
) -> Tuple[Any, Any]:
    """Run ``step_fn`` over the leading axis of ``batches`` (the k local
    steps) with ``lax.scan``, then pmean-sync the parameters once.

    params_of / with_params project the param pytree out of / back into
    the carry (so optimizer state stays slice-local, like the reference's
    geo mode which only pushes parameter diffs)."""
    carry, outs = jax.lax.scan(step_fn, carry, batches)
    synced = geo_sync(params_of(carry), axis_name)
    return with_params(carry, synced), outs


def average_params(param_copies: list) -> Any:
    """Host-side geo sync across slice-local param pytrees (the DCN path
    when slices run as separate jax processes)."""
    n = len(param_copies)
    return jax.tree.map(lambda *xs: sum(xs) / n, *param_copies)
