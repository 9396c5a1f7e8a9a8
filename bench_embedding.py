"""Embedding-engine bandwidth report (the BASELINE.json "lookup GB/s"
north star; supplementary to bench.py, which stays the driver's single
tracked metric).

Prints one JSON line per measurement: forward gather, fwd+bwd, and the
full DeepFM train step, with effective GB/s over the logical bytes moved.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    # tunnel-honest sync: host readback (see doc/benchmark.md)
    return float(jnp.sum(x) * 0)


def main():
    from paddlerec_tpu.ops.packed_embedding import (
        init_packed_table, packed_lookup, sub_width,
    )

    vocab, dim, n = 1_000_001, 9, 27 * 8192
    w = sub_width(dim)
    table = init_packed_table(jax.random.PRNGKey(0), vocab, dim)
    ids = jax.device_put(
        jnp.asarray(np.random.RandomState(0).randint(0, vocab, n), jnp.int32)
    )
    logical_bytes = n * w * 4  # lane-window bytes actually used

    fwd = jax.jit(lambda tb, i: packed_lookup(tb, i, dim).sum())
    vg = jax.jit(jax.value_and_grad(
        lambda tb: packed_lookup(tb, ids, dim).sum()
    ))

    def timeit(fn, *args, steps=60):
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        t0 = time.time()
        for _ in range(steps):
            out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        return (time.time() - t0) / steps

    t_fwd = timeit(fwd, table, ids)
    t_bwd = timeit(lambda tb: vg(tb), table)
    for name, t, mult in (("lookup_fwd", t_fwd, 1), ("lookup_fwd_bwd", t_bwd, 3)):
        print(json.dumps({
            "metric": f"embedding_{name}",
            "value": round(logical_bytes * mult / t / 1e9, 2),
            "unit": "GB/s",
            "ms": round(t * 1000, 3),
            "lookups_per_s": round(n / t / 1e6, 1),
        }))


if __name__ == "__main__":
    main()
