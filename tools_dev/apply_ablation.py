"""Ablate the sparse row-wise apply at vocab 1e7 (phase hunt)."""
import sys, time, json
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

VOCAB, BS, S = 10_000_000, 8192, 26
N = BS * S
from paddlerec_tpu.ops.sparse_update import host_dedup, SENTINEL

pack = 8  # dim 9 -> sub width 16 -> pack 8
R = (VOCAB + pack - 1) // pack
rng = np.random.RandomState(0)
table = jnp.asarray(rng.randn(R, 128).astype(np.float32)).astype(jnp.bfloat16)
acc = jnp.zeros((R,), jnp.float32)
ids = rng.randint(0, VOCAB, N).astype(np.int64)
uniq_np, slot_np = host_dedup(ids, VOCAB, pack)
uniq = jnp.asarray(uniq_np); slot = jnp.asarray(slot_np)
delta = jnp.asarray(rng.randn(N, 128).astype(np.float32) * 1e-3)
lr = 0.01

def timeit(fn, label, *args, steps=40):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
    carry = args
    t0 = time.time()
    o = None
    for i in range(steps):
        o = fn(*carry)
        # chain dependency: feed table/acc back when shapes match
        carry = tuple(o) + carry[len(o):] if isinstance(o, tuple) else carry
    _ = float(jax.tree.leaves(o)[0].reshape(-1)[0].astype(jnp.float32))
    el = (time.time()-t0)/steps*1000
    print(f"{label}: {el:.2f} ms", flush=True)
    return el

@jax.jit
def full_apply(table, acc, delta):
    g_uniq = jnp.zeros((uniq.shape[0], 128), jnp.float32).at[slot].add(delta)
    safe = jnp.minimum(uniq, table.shape[0]-1)
    a_r = acc[safe] + (g_uniq*g_uniq).mean(-1)
    t_n = (table[safe].astype(jnp.float32) - lr*g_uniq*jax.lax.rsqrt(a_r+1e-8)[:,None])
    return (table.at[uniq].set(t_n.astype(table.dtype), mode="drop"),
            acc.at[uniq].set(a_r, mode="drop"))

@jax.jit
def merge_only(table, acc, delta):
    g_uniq = jnp.zeros((uniq.shape[0], 128), jnp.float32).at[slot].add(delta)
    return (table + 0*g_uniq[0,0].astype(table.dtype), acc + g_uniq[0,1])

@jax.jit
def gather_update_only(table, acc, delta):
    # skip the merge: treat delta rows as already-merged (approx traffic)
    safe = jnp.minimum(uniq, table.shape[0]-1)
    g_uniq = delta
    a_r = acc[safe] + (g_uniq*g_uniq).mean(-1)
    t_n = (table[safe].astype(jnp.float32) - lr*g_uniq*jax.lax.rsqrt(a_r+1e-8)[:,None])
    return (table.at[uniq].set(t_n.astype(table.dtype), mode="drop"),
            acc.at[uniq].set(a_r, mode="drop"))

@jax.jit
def scatter_only(table, acc, delta):
    return (table.at[uniq].set(delta.astype(table.dtype), mode="drop"),
            acc.at[uniq].set(delta[:,0], mode="drop"))

@jax.jit
def gather_only(table, acc, delta):
    safe = jnp.minimum(uniq, table.shape[0]-1)
    rows = table[safe].astype(jnp.float32)
    return (table + rows[0,0].astype(table.dtype)*0, acc)

t_full = timeit(full_apply, "full apply", table, acc, delta)
t_merge = timeit(merge_only, "merge (scatter-add) only", table, acc, delta)
t_gu = timeit(gather_update_only, "gather+update (no merge)", table, acc, delta)
t_sc = timeit(scatter_only, "scatter only", table, acc, delta)
t_ga = timeit(gather_only, "gather only", table, acc, delta)
print(json.dumps({"full": t_full, "merge": t_merge, "gather_update": t_gu,
                  "scatter": t_sc, "gather": t_ga}))
