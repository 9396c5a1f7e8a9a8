import time, json
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

VOCAB, BS, S = 10_000_000, 8192, 26
N = BS*S
pack = 8
R = (VOCAB + pack - 1) // pack
rng = np.random.RandomState(0)
ids = rng.randint(0, VOCAB, N).astype(np.int64)
phys = (ids % VOCAB) // pack
uniq_v, inv = np.unique(phys, return_inverse=True)
n_u = len(uniq_v)
# sentinel-padded (current) vs unique-padded
uniq_sent = np.full(N, np.iinfo(np.int32).max, np.int32); uniq_sent[:n_u] = uniq_v
uniq_uni  = (R + np.arange(N, dtype=np.int64)).astype(np.int64)
uniq_uni[:n_u] = uniq_v
uniq_uni = uniq_uni.astype(np.int32)

t_bf = jnp.asarray(rng.randn(R,128).astype(np.float32)).astype(jnp.bfloat16)
t_f32 = jnp.asarray(rng.randn(R,128).astype(np.float32))
vals = jnp.asarray(rng.randn(N,128).astype(np.float32))
us = jnp.asarray(uniq_sent); uu = jnp.asarray(uniq_uni)

def timeit(fn, label, tbl, steps=40):
    o = fn(tbl); _ = float(o.reshape(-1)[0].astype(jnp.float32))
    t0=time.time()
    for _ in range(steps): o = fn(o)
    _ = float(o.reshape(-1)[0].astype(jnp.float32))
    el=(time.time()-t0)/steps*1000
    print(f"{label}: {el:.2f} ms", flush=True)
    return el

f1 = jax.jit(lambda t: t.at[us].set(vals.astype(t.dtype), mode="drop"))
f2 = jax.jit(lambda t: t.at[uu].set(vals.astype(t.dtype), mode="drop", unique_indices=True))
f3 = jax.jit(lambda t: t.at[uu].set(vals.astype(t.dtype), mode="drop"))
timeit(f1, "bf16 scatter sentinel-pad", t_bf)
timeit(f2, "bf16 scatter unique-pad + unique_indices", t_bf)
timeit(f3, "bf16 scatter unique-pad (no hint)", t_bf)
timeit(f1, "f32 scatter sentinel-pad", t_f32)
timeit(f2, "f32 scatter unique-pad + unique_indices", t_f32)
# scatter-add comparison (merge op)
slot = jnp.asarray(inv.astype(np.int32))
g = jax.jit(lambda t: jnp.zeros((N,128), jnp.float32).at[slot].add(vals) + 0*t[0,0].astype(jnp.float32))
timeit(lambda t: g(t), "merge scatter-add (N,128)", t_f32)
