"""Sequence ops: GRU / AUGRU as lax.scan recurrences.

Used by DIEN's interest-extraction (GRU) and interest-evolution (AUGRU —
attention-update-gate GRU) layers (reference models/rank/dien/net.py).
Scans carry (B, H) hidden state over the time axis — XLA compiles one
fused step; sequence lengths are static (padded + masked).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class GRU(nn.Module):
    """Masked GRU over (B, T, D) → outputs (B, T, H), final state (B, H)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        b, t, d = x.shape
        h0 = jnp.zeros((b, self.hidden_size), x.dtype)
        dense_i = nn.Dense(3 * self.hidden_size, name="wi")
        dense_h = nn.Dense(3 * self.hidden_size, use_bias=False, name="wh")
        xi = dense_i(x)  # precompute input projections: (B, T, 3H)

        def step(h, inp):
            xi_t, m_t = inp
            gates_h = dense_h(h)
            xr, xz, xn = jnp.split(xi_t, 3, axis=-1)
            hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
            r = nn.sigmoid(xr + hr)
            z = nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1 - z) * n + z * h
            if m_t is not None:
                h_new = jnp.where(m_t[:, None] > 0, h_new, h)
            return h_new, h_new

        ms = (
            jnp.moveaxis(mask, 1, 0)
            if mask is not None
            else jnp.ones((t, b), x.dtype)
        )
        final, outs = nn.scan(
            lambda mdl, carry, inp: step(carry, inp),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(self, h0, (jnp.moveaxis(xi, 1, 0), ms))
        return jnp.moveaxis(outs, 0, 1), final


class AUGRU(nn.Module):
    """GRU with attention-scaled update gate (DIEN interest evolution).

    att: (B, T) attention scores in [0, 1] multiply the update gate z.
    """

    hidden_size: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        att: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ):
        b, t, d = x.shape
        h0 = jnp.zeros((b, self.hidden_size), x.dtype)
        dense_i = nn.Dense(3 * self.hidden_size, name="wi")
        dense_h = nn.Dense(3 * self.hidden_size, use_bias=False, name="wh")
        xi = dense_i(x)

        def step(h, inp):
            xi_t, a_t, m_t = inp
            gates_h = dense_h(h)
            xr, xz, xn = jnp.split(xi_t, 3, axis=-1)
            hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
            r = nn.sigmoid(xr + hr)
            z = nn.sigmoid(xz + hz) * a_t[:, None]  # attention-scaled gate
            n = jnp.tanh(xn + r * hn)
            h_new = (1 - z) * h + z * n
            if m_t is not None:
                h_new = jnp.where(m_t[:, None] > 0, h_new, h)
            return h_new, h_new

        ms = (
            jnp.moveaxis(mask, 1, 0)
            if mask is not None
            else jnp.ones((t, b), x.dtype)
        )
        final, outs = nn.scan(
            lambda mdl, carry, inp: step(carry, inp),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(self, h0, (jnp.moveaxis(xi, 1, 0), jnp.moveaxis(att, 1, 0), ms))
        return jnp.moveaxis(outs, 0, 1), final
