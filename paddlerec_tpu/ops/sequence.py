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


class LSTM(nn.Module):
    """Masked LSTM over (B, T, D) → outputs (B, T, H), final state (B, H).

    Same scan pattern as GRU; used by DSIN's session-interest interacting
    BiLSTM (reference models/rank/dsin/net.py:224-228).
    """

    hidden_size: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        b, t, d = x.shape
        h0 = (
            jnp.zeros((b, self.hidden_size), x.dtype),
            jnp.zeros((b, self.hidden_size), x.dtype),
        )
        dense_i = nn.Dense(4 * self.hidden_size, name="wi")
        dense_h = nn.Dense(4 * self.hidden_size, use_bias=False, name="wh")
        xi = dense_i(x)

        def step(carry, inp):
            h, c = carry
            xi_t, m_t = inp
            gi, gf, gg, go = jnp.split(xi_t + dense_h(h), 4, axis=-1)
            i = nn.sigmoid(gi)
            f = nn.sigmoid(gf)
            g = jnp.tanh(gg)
            o = nn.sigmoid(go)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            if m_t is not None:
                keep = m_t[:, None] > 0
                h_new = jnp.where(keep, h_new, h)
                c_new = jnp.where(keep, c_new, c)
            return (h_new, c_new), h_new

        ms = (
            jnp.moveaxis(mask, 1, 0)
            if mask is not None
            else jnp.ones((t, b), x.dtype)
        )
        xs = jnp.moveaxis(xi, 1, 0)
        if self.reverse:
            xs, ms = xs[::-1], ms[::-1]
        (h_final, _), outs = nn.scan(
            lambda mdl, carry, inp: step(carry, inp),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(self, h0, (xs, ms))
        if self.reverse:
            outs = outs[::-1]
        return jnp.moveaxis(outs, 0, 1), h_final


class BiLSTM(nn.Module):
    """Stacked bidirectional LSTM; returns (B, T, 2H) concat outputs."""

    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        out = x
        for i in range(self.num_layers):
            fwd, _ = LSTM(self.hidden_size, name=f"fwd_{i}")(out, mask)
            bwd, _ = LSTM(self.hidden_size, reverse=True, name=f"bwd_{i}")(
                out, mask
            )
            out = jnp.concatenate([fwd, bwd], axis=-1)
        return out


def sinusoidal_position_encoding(t: int, d: int, dtype=jnp.float32):
    """Standard sin/cos positional table (T, D) (DSIN PositionalEncoder,
    models/rank/dsin/sequence_layers.py)."""
    import numpy as np

    pos = np.arange(t)[:, None]
    i = np.arange(d)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / max(d, 1))
    table = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return jnp.asarray(table, dtype)


class TransformerBlock(nn.Module):
    """Post-norm transformer encoder block with key-padding mask.

    Shared by BST (behavior-sequence transformer) and DSIN's session
    interest extractor (reference nn.TransformerEncoderLayer usage).
    """

    num_heads: int
    head_dim: int
    ffn_dim: int
    ffn_activation: str = "relu"

    @nn.compact
    def __call__(self, x, mask):  # x: (B, T, D), mask: (B, T)
        b, t, d = x.shape
        h, hd = self.num_heads, self.head_dim
        q = nn.Dense(h * hd, name="q")(x).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = nn.Dense(h * hd, name="k")(x).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = nn.Dense(h * hd, name="v")(x).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
        scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e9)
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
        out = nn.Dense(d, name="proj")(out)
        x = nn.LayerNorm(name="ln1")(x + out)
        act = {"relu": nn.relu, "gelu": nn.gelu}[self.ffn_activation]
        ffn = nn.Dense(d, name="ffn2")(act(nn.Dense(self.ffn_dim, name="ffn1")(x)))
        return nn.LayerNorm(name="ln2")(x + ffn)
