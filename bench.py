"""Benchmark: DeepFM training throughput on Criteo-shaped data.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference's published DeepFM repro — batch 512, 1 epoch of
full Criteo (~45.8M rows) in ≈2 h on one device
(models/rank/deepfm/readme.md 效果复现) → ≈6366 examples/s.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IPS = 45_840_617 / (2 * 3600.0)  # ≈ 6366 examples/s


def main():
    from paddlerec_tpu.core.config import Config
    from paddlerec_tpu.core import metrics as metrics_lib
    from paddlerec_tpu.core.registry import get_model_class
    from paddlerec_tpu.data.synthetic import synthetic_batch
    from paddlerec_tpu.train.state import TrainState

    batch_size = 8192
    vocab = 1_000_001
    cfg = Config(
        {
            "hyper_parameters.optimizer.class": "Adam",
            "hyper_parameters.optimizer.learning_rate": 0.001,
            "hyper_parameters.sparse_inputs_slots": 27,
            "hyper_parameters.sparse_feature_number": vocab,
            "hyper_parameters.sparse_feature_dim": 9,
            "hyper_parameters.dense_input_dim": 13,
            "hyper_parameters.fc_sizes": [512, 256, 128, 32],
            # bf16 table: half the HBM traffic, AUC parity verified to
            # <0.002 on planted-signal data (tests/test_sparse_update.py)
            "hyper_parameters.sparse_feature_dtype": "bfloat16",
        }
    )
    model_def = get_model_class("rank.deepfm")(cfg)
    params = model_def.init_params(jax.random.PRNGKey(0))
    tx = model_def.create_optimizer()
    state = TrainState.create(params, tx)
    metric_state = metrics_lib.init_auc_state()

    def train_step(state, batch, metric_state):
        def loss_fn(p):
            return model_def.train_forward(p, batch)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        metric_state = metrics_lib.update_auc_state(
            metric_state, aux["predictions"], aux["labels"]
        )
        return state, metric_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 2))

    rng = np.random.RandomState(0)
    batches = [
        jax.device_put(
            jax.tree.map(
                jnp.asarray, synthetic_batch(rng, batch_size, vocab=vocab)
            )
        )
        for _ in range(8)
    ]

    # warmup / compile.  NOTE: under the axon tunnel block_until_ready is a
    # no-op; a host readback (float()) is the only honest sync point.
    state, metric_state, loss = step(state, batches[0], metric_state)
    _ = float(loss)

    # measure tunnel round-trip to subtract from the loop timing
    rtts = []
    for _i in range(3):
        t0 = time.time()
        _ = float(loss + 0)
        rtts.append(time.time() - t0)
    rtt = min(rtts)

    steps = 200
    t0 = time.time()
    for i in range(steps):
        state, metric_state, loss = step(state, batches[i % len(batches)], metric_state)
    _ = float(loss)  # forces completion of the whole chain
    elapsed = max(time.time() - t0 - rtt, 1e-9)
    ips = steps * batch_size / elapsed

    print(
        json.dumps(
            {
                "metric": "deepfm_criteo_train_ips",
                "value": round(ips, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(ips / REFERENCE_IPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
