"""Per-step phase breakdown by ablation (SURVEY §5 speed-of-light report).

Through the tunnel, jax.profiler traces are unavailable; phases are
isolated by timing VARIANTS of the jitted step that omit pieces, each as
a >=60-step donated chain with one host-readback sync (the honest
methodology from doc/benchmark.md)."""
import sys, time, json
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

VOCAB = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
MODE = sys.argv[2] if len(sys.argv) > 2 else "sparse"  # sparse|dense
BS = 8192

from paddlerec_tpu.core.config import Config
from paddlerec_tpu.core.registry import get_model_class
from paddlerec_tpu.train.state import TrainState
from paddlerec_tpu.data.synthetic import synthetic_batch

cfg = Config({
    "runner.train_batch_size": BS,
    "runner.infer_batch_size": BS,
    "hyper_parameters.optimizer.class": __import__("os").environ.get("ROPT", "Adam"),
    "hyper_parameters.optimizer.learning_rate": 0.001,
    "hyper_parameters.sparse_inputs_slots": 27,
    "hyper_parameters.sparse_feature_number": VOCAB,
    "hyper_parameters.sparse_feature_dim": 9,
    "hyper_parameters.dense_input_dim": 13,
    "hyper_parameters.fc_sizes": [512, 256, 128, 32],
    "hyper_parameters.sparse_feature_dtype": "bfloat16",
    "hyper_parameters.sparse_update": MODE == "sparse",
    "hyper_parameters.sparse_update_rule": "adagrad",
})
md = get_model_class("rank.dnn")(cfg)
params = md.init_params(jax.random.PRNGKey(0))
tx = md.create_optimizer()
state = TrainState.create(params, tx)
extra = md.init_sparse_state(params) if MODE == "sparse" else None
state = state.replace(extra=extra)

rng = np.random.RandomState(0)
batches = []
for _ in range(8):
    b = synthetic_batch(rng, BS, vocab=VOCAB)
    if MODE == "sparse":
        b = md.augment_batch_host(b)
    batches.append(jax.device_put(jax.tree.map(jnp.asarray, b)))

def fresh_state():
    params = md.init_params(jax.random.PRNGKey(0))
    st = TrainState.create(params, tx)
    return st.replace(extra=md.init_sparse_state(params)
                      if MODE == "sparse" else None)

def timeit(fn, label, steps=60):
    s = fresh_state()
    s = fn(s, batches[0])
    _ = float(jax.tree.leaves(s.params)[0].reshape(-1)[0].astype(jnp.float32))
    t0 = time.time()
    for i in range(steps):
        s = fn(s, batches[i % 8])
    _ = float(jax.tree.leaves(s.params)[0].reshape(-1)[0].astype(jnp.float32))
    el = (time.time() - t0) / steps * 1000
    print(f"{label}: {el:.2f} ms/step", flush=True)
    return el

# v1 full step
def full(s, b):
    def loss_fn(p):
        loss, _ = md.train_forward(p, b)
        return loss
    loss, grads = jax.value_and_grad(loss_fn)(s.params)
    s = s.apply_gradients(grads)
    if s.extra is not None:
        p2, e2 = md.apply_sparse_updates(s.params, s.extra, grads, b)
        s = s.replace(params=p2, extra=e2)
    return s
full = jax.jit(full, donate_argnums=0)

# v2 fwd+bwd only; params perturbed so the chain isn't dead-code
def fwdbwd(s, b):
    def loss_fn(p):
        loss, _ = md.train_forward(p, b)
        return loss
    loss, grads = jax.value_and_grad(loss_fn)(s.params)
    new_p = jax.tree.map(lambda p, g: p - 0 * jnp.asarray(loss, p.dtype) * 0 + p * 0 + p if g is None else p, s.params, s.params)
    # cheap dependency: add loss into one dense bias
    def bump(path, x):
        return x + jnp.asarray(loss * 1e-20, x.dtype) if x.ndim == 1 else x
    new_p = jax.tree_util.tree_map_with_path(bump, s.params)
    return s.replace(params=new_p)
fwdbwd = jax.jit(fwdbwd, donate_argnums=0)

# v3 forward only
def fwd(s, b):
    loss, _ = md.train_forward(s.params, b)
    def bump(path, x):
        return x + jnp.asarray(loss * 1e-20, x.dtype) if x.ndim == 1 else x
    return s.replace(params=jax.tree_util.tree_map_with_path(bump, s.params))
fwd = jax.jit(fwd, donate_argnums=0)

VARIANT = sys.argv[3] if len(sys.argv) > 3 else "all"
res = {}
if VARIANT in ("all", "full"):
    res["full_ms"] = timeit(full, f"full step ({MODE}, vocab {VOCAB:.0e})")
if VARIANT in ("all", "fwdbwd"):
    res["fwd_bwd_ms"] = timeit(fwdbwd, "forward+backward (no optimizer)")
if VARIANT in ("all", "fwd"):
    res["fwd_ms"] = timeit(fwd, "forward only")
print(json.dumps(dict(res, vocab=VOCAB, mode=MODE)), flush=True)
