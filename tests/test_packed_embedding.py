"""Packed-layout embedding: forward/backward must match the plain table."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerec_tpu.ops.packed_embedding import (
    pack_table,
    packed_lookup,
    packed_shape,
    sub_width,
    unpack_table,
)


def test_sub_width_and_shape():
    assert sub_width(1) == 8
    assert sub_width(9) == 16
    assert sub_width(16) == 16
    assert sub_width(17) == 32
    assert sub_width(128) == 128
    rows, lanes = packed_shape(1000, 16)
    assert lanes == 128 and rows == 125
    rows, _ = packed_shape(1001, 16)
    assert rows == 126  # ceil


def test_pack_unpack_roundtrip(rng):
    dense = rng.randn(1000, 9).astype(np.float32)
    packed = pack_table(dense)
    assert packed.shape == packed_shape(1000, 9)
    np.testing.assert_array_equal(unpack_table(packed, 1000, 9), dense)


@pytest.mark.parametrize("dim", [1, 9, 16, 64, 128])
def test_forward_matches_take(rng, dim):
    v = 500
    dense = rng.randn(v, dim).astype(np.float32)
    packed = jnp.asarray(pack_table(dense))
    ids = jnp.asarray(rng.randint(0, v, size=(32, 7)), jnp.int32)
    out = packed_lookup(packed, ids, dim)
    ref = jnp.take(jnp.asarray(dense), ids, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("dim", [9, 16])
def test_gradient_matches_take(rng, dim):
    v = 300
    dense = rng.randn(v, dim).astype(np.float32)
    packed = jnp.asarray(pack_table(dense))
    # include duplicate ids to exercise scatter-add collisions
    ids = jnp.asarray(
        np.concatenate([rng.randint(0, v, size=62), [5, 5]]).reshape(8, 8),
        jnp.int32,
    )
    tgt = jnp.asarray(rng.randn(8, 8, dim).astype(np.float32))

    def loss_packed(t):
        return jnp.sum((packed_lookup(t, ids, dim) - tgt) ** 2)

    def loss_plain(t):
        return jnp.sum((jnp.take(t, ids, axis=0) - tgt) ** 2)

    g_packed = jax.grad(loss_packed)(packed)
    g_plain = jax.grad(loss_plain)(jnp.asarray(dense))
    np.testing.assert_allclose(
        unpack_table(np.asarray(g_packed), v, dim), np.asarray(g_plain), rtol=1e-5
    )
    # pad lanes receive zero grad
    w = sub_width(dim)
    if w != dim:
        full = np.asarray(g_packed).reshape(-1, w)
        assert np.all(full[:, dim:] == 0)


def test_jit_and_vocab_not_multiple_of_pack(rng):
    v, dim = 1003, 9
    dense = rng.randn(v, dim).astype(np.float32)
    packed = jnp.asarray(pack_table(dense))
    ids = jnp.asarray(rng.randint(0, v, size=(16,)), jnp.int32)
    out = jax.jit(lambda t, i: packed_lookup(t, i, dim))(packed, ids)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(dense)[np.asarray(ids)], rtol=1e-6
    )
