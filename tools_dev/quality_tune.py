"""One-compile hyperparameter tuning on the Criteo-scale corpus.

The tunnel makes every distinct HLO a ~20-minute compile, so the
classic sweep (one process per (lr, el2)) is infeasible.  With
optimizer.runtime_inject the lr/embedding_l2 live in opt_state:
this harness compiles the train step ONCE, then runs every config by
Trainer.reset_state() + Trainer.set_hyperparams() — plus optional
per-epoch lr decay, which no static-graph sweep could do at all.

usage:
  python tools_dev/quality_tune.py <model> <data_dir> [plan.json]

plan.json: [{"name": ..., "lr": ..., "el2": ..., "epochs": N,
             "lr_decay": f, "decay_from": k}, ...]
Defaults to the deepfm el2/lr-decay search plan.
"""
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paddlerec_tpu.core.config import Config  # noqa: E402
from paddlerec_tpu.train.trainer import Trainer  # noqa: E402

DEFAULT_PLAN = [
    # el2 = posterior-shrinkage strength; long runs + lr decay because
    # the pairwise-latent signal (the 0.69 -> 0.80 band) trains slowly
    # while el2 keeps tail-id memorization from eating the gains
    {"name": "el2_0.03", "lr": 1e-3, "el2": 0.03, "epochs": 14,
     "lr_decay": 0.7, "decay_from": 4},
    {"name": "el2_0.1", "lr": 1e-3, "el2": 0.1, "epochs": 14,
     "lr_decay": 0.7, "decay_from": 4},
    {"name": "el2_0.01", "lr": 1e-3, "el2": 0.01, "epochs": 14,
     "lr_decay": 0.7, "decay_from": 4},
    {"name": "lr2e3_el2_0.03", "lr": 2e-3, "el2": 0.03, "epochs": 14,
     "lr_decay": 0.6, "decay_from": 3},
]


def build_config(model: str, data: str, meta: dict) -> Config:
    """The shared sweep config (one compile per model; lr/el2 are
    runtime-injected so every plan entry reuses it)."""
    if model.startswith("dev."):
        import tools_dev.synth_probe_model  # noqa: F401  (registers dev.*)
    return Config({
        "runner.model": model,
        "runner.train_data_dir": os.path.join(data, "train"),
        "runner.test_data_dir": os.path.join(data, "test"),
        "runner.train_batch_size": int(os.environ.get("QBS", 8192)),
        "runner.infer_batch_size": 8192,
        "runner.epochs": 1,
        "runner.print_interval": 2000,
        "runner.wire_format": "compact",
        "runner.feed_superbatch": 16,
        # the 45.8M-row corpus is ~4.8 GB on the wire — keep it resident
        # in HBM so every epoch after the first runs at the device rate
        # (and the whole multi-config sweep restages nothing)
        "runner.feed_device_resident": True,
        "runner.resident_max_gb": float(os.environ.get("QRES_GB", 8.0)),
        "runner.shuffle_files": True,
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.sparse_feature_number": meta["vocab"],
        "hyper_parameters.sparse_feature_dim": int(os.environ.get("QDIM", 9)),
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.fc_sizes": [512, 256, 128, 32],
        "hyper_parameters.sparse_feature_dtype": os.environ.get(
            "QDT", "bfloat16"),
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 1e-3,
        "hyper_parameters.optimizer.runtime_inject": True,
        "hyper_parameters.optimizer.lazy_mode":
            os.environ.get("QLAZY", "") == "1",
        "hyper_parameters.embedding_l2": 0.0,
    })


def run_plan(t: Trainer, plan: list, model: str, meta: dict) -> list:
    """Run every spec in the plan on an already-initialized Trainer,
    printing CONFIG/CONFIG_DONE/TUNE_RESULT lines; returns results."""
    all_results = []
    for spec in plan:
        t.reset_state(seed=int(spec.get("seed", 2023)))
        lr = float(spec["lr"])
        t.set_hyperparams(learning_rate=lr,
                          embedding_l2=float(spec.get("el2", 0.0)))
        best, declines, rows = 0.0, 0, []
        for epoch in range(int(spec.get("epochs", 4))):
            if spec.get("lr_decay") and epoch >= int(spec.get("decay_from", 1)):
                lr *= float(spec["lr_decay"])
                t.set_hyperparams(learning_rate=lr)
            t0 = time.time()
            tm = t.train()
            ev = t.evaluate()
            row = {"epoch": epoch, "lr": round(lr, 8),
                   "train_auc": round(tm.get("auc", 0.0), 5),
                   "test_auc": round(ev.get("auc", 0.0), 5),
                   "wall_s": round(time.time() - t0, 1)}
            rows.append(row)
            print(f"CONFIG {spec['name']} " + json.dumps(row), flush=True)
            if row["test_auc"] > best:
                best, declines = row["test_auc"], 0
            else:
                declines += 1
                if declines >= 2 and not spec.get("no_early_stop"):
                    break
        all_results.append({"name": spec['name'], "spec": spec,
                            "best_test_auc": best, "epochs": rows})
        print("CONFIG_DONE " + json.dumps(all_results[-1]), flush=True)
    all_results.sort(key=lambda r: -r["best_test_auc"])
    print("TUNE_RESULT " + json.dumps({
        "model": model, "bayes_auc": meta["bayes_auc"],
        "best": all_results[0] if all_results else None,
        "ranked": [(r["name"], r["best_test_auc"]) for r in all_results],
    }), flush=True)
    return all_results


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "rank.deepfm"
    data = sys.argv[2] if len(sys.argv) > 2 else "/root/criteo_v4"
    plan = DEFAULT_PLAN
    if len(sys.argv) > 3:
        with open(sys.argv[3]) as f:
            plan = json.load(f)
    meta = json.load(open(os.path.join(data, "meta.json")))
    t = Trainer(build_config(model, data, meta))
    t.init_state()
    run_plan(t, plan, model, meta)


if __name__ == "__main__":
    main()
