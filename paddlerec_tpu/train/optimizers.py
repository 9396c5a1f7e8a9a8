"""Custom optimizers beyond optax's built-ins.

GRDA (generalized regularized dual averaging) reproduces the AutoFIS
interaction-gate search optimizer (reference
models/rank/autofis/optimizer.py:18-75): a dual-averaging accumulator with a
time-growing soft-threshold, driving gate weights exactly to zero so the
search stage selects a sparse set of feature interactions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class GrdaState(NamedTuple):
    accumulator: optax.Params
    l1_accumulation: jnp.ndarray
    count: jnp.ndarray


def grda(
    learning_rate: float = 0.01, c: float = 0.0, mu: float = 0.7
) -> optax.GradientTransformation:
    """p_{t+1} = sign(a_{t+1}) · max(|a_{t+1}| − ℓ1(t), 0), where
    a_{t+1} = a_t + [t = 0]·p_t − lr·g_t and
    ℓ1(t) = c · lr^{0.5+μ} · (t+1)^μ accumulates over steps.

    Matches SimpleGrda.step (autofis/optimizer.py:36-60).  Note: optax
    transformations return *updates*; we emit (new_p − p) so
    ``optax.apply_updates`` lands on new_p exactly.
    """

    def init_fn(params):
        # the reference initializes the dual-averaging accumulator
        # Uniform(-0.1, 0.1) (autofis/optimizer.py:28-33) — a permanent
        # per-weight offset that decides which gates the soft threshold
        # drives to zero.  Deterministic seeded uniform keeps parity
        # without threading an rng through optax.init.
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(20211015), len(leaves))
        acc = jax.tree_util.tree_unflatten(treedef, [
            jax.random.uniform(k, l.shape, l.dtype, -0.1, 0.1)
            for k, l in zip(keys, leaves)
        ])
        return GrdaState(
            accumulator=acc,
            l1_accumulation=jnp.zeros((), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("grda requires params")
        t = state.count.astype(jnp.float32)
        l1_diff = (
            c * learning_rate ** (0.5 + mu) * (t + 1.0) ** mu
            - c * learning_rate ** (0.5 + mu) * t**mu
        )
        l1_acc = state.l1_accumulation + l1_diff
        first = jnp.maximum(1.0 - t, 0.0)

        new_acc = jax.tree.map(
            lambda p, g, a: a + first * p - learning_rate * g,
            params, grads, state.accumulator,
        )
        updates = jax.tree.map(
            lambda p, a: jnp.sign(a) * jnp.maximum(jnp.abs(a) - l1_acc, 0.0)
            - p,
            params, new_acc,
        )
        return updates, GrdaState(new_acc, l1_acc, state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


class LazyAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def lazy_adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam that only updates rows touched this step.

    Parity target: the reference's sparse-table optimizers — paddle's
    ``Adam(lazy_mode=True)`` (hyper_parameters.optimizer.lazy_mode, read
    by every dygraph_model) and the PS accessors — update moments and
    parameters ONLY for rows whose gradient is non-zero.  With dense
    (scatter-add-produced) embedding gradients the masked form preserves
    those semantics: untouched rows keep their moments un-decayed and
    receive no bias-correction drift.

    Row granularity = the leading axis of each ≥2-D leaf; lower-rank
    leaves fall back to element masking.
    """

    def _mask(g):
        if g.ndim >= 2:
            touched = jnp.any(g != 0, axis=tuple(range(1, g.ndim)),
                              keepdims=True)
        else:
            touched = g != 0
        return touched.astype(g.dtype)

    def init_fn(params):
        return LazyAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params=None):
        count = state.count + 1
        masks = jax.tree.map(_mask, grads)
        mu = jax.tree.map(
            lambda m, g, k: m * (1 - k) + k * (b1 * m + (1 - b1) * g),
            state.mu, grads, masks,
        )
        nu = jax.tree.map(
            lambda v, g, k: v * (1 - k) + k * (b2 * v + (1 - b2) * g * g),
            state.nu, grads, masks,
        )
        c = count.astype(jnp.float32)
        bc1 = 1 - b1**c
        bc2 = 1 - b2**c
        updates = jax.tree.map(
            lambda m, v, k: -learning_rate * k * (m / bc1)
            / (jnp.sqrt(v / bc2) + eps),
            mu, nu, masks,
        )
        return updates, LazyAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)
