"""Pallas kernels: interpreter-mode parity (Mosaic compile needs real
direct-attached TPU; the CI/CPU path runs the interpreter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerec_tpu.ops.pallas_embedding import (
    gather_pool,
    gather_pool_reference,
)


@pytest.mark.parametrize("pool_l", [1, 3, 4, 8])
def test_gather_pool_parity(pool_l):
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(500, 128).astype("f"))
    ids = jnp.asarray(rng.randint(0, 500, (24, pool_l)))
    mask = jnp.asarray((rng.rand(24, pool_l) < 0.7).astype("f"))
    out = gather_pool(table, ids, mask, interpret=True)
    ref = gather_pool_reference(table, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_gather_pool_mask_zeroes_rows():
    table = jnp.ones((100, 128), jnp.float32)
    ids = jnp.zeros((8, 4), jnp.int32)
    mask = jnp.zeros((8, 4), jnp.float32)
    out = gather_pool(table, ids, mask, interpret=True)
    assert float(jnp.abs(out).max()) == 0.0


def test_gather_pool_requires_tile_multiple():
    table = jnp.ones((10, 128), jnp.float32)
    with pytest.raises(AssertionError, match="multiple"):
        gather_pool(table, jnp.zeros((7, 2), jnp.int32),
                    jnp.ones((7, 2)), interpret=True)
