"""Multi-model quality sweep sharing ONE staged corpus.

Staging the 4.8 GB wire-encoded corpus through a narrow host->device
link dominates per-model sweep time, but the staged superbatches are
model-INDEPENDENT (raw wire arrays, decoded in-jit per model).  This
driver runs several models' tuning plans in one process and hands the
device-resident superbatch store (Trainer._resident) from one Trainer
to the next, so the corpus is staged exactly once for the whole table.

usage:
  python tools_dev/quality_multi.py <data_dir> <spec.json>

spec.json: [{"model": "rank.dnn", "plan": [<quality_tune specs>]}, ...]
A later entry may set "plan": "best" to reuse the highest-scoring spec
found for the most recent model that ran a concrete plan (tune
hyperparams once on one family member, apply to the rest).
"""
import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paddlerec_tpu.train.trainer import Trainer  # noqa: E402
from tools_dev.quality_tune import build_config, run_plan  # noqa: E402


def main():
    data = sys.argv[1]
    with open(sys.argv[2]) as f:
        specs = json.load(f)
    meta = json.load(open(os.path.join(data, "meta.json")))
    shared = None
    summary = []
    concrete_results = None
    for entry in specs:
        model = entry["model"]
        print(f"MODEL_START {model}", flush=True)
        cfg = build_config(model, data, meta)
        for k, v in entry.get("hyper", {}).items():
            cfg[f"hyper_parameters.{k}"] = v
        t = Trainer(cfg)
        t.init_state()
        if shared is not None:
            t._resident = shared
        plan = entry["plan"]
        if plan == "best":
            if not concrete_results:
                raise SystemExit("'best' needs an earlier concrete plan")
            plan = [concrete_results[0]["spec"]]
        else:
            concrete_results = None  # set from this entry's results below
        results = run_plan(t, plan, model, meta)
        if concrete_results is None:
            concrete_results = results
        shared = t._resident
        summary.append({
            "model": model,
            "best": results[0]["name"] if results else None,
            "best_test_auc": results[0]["best_test_auc"] if results else None,
        })
        # drop the model/optimizer state before the next compile; only
        # the resident superbatches stay alive across models
        t.state = None
        del t
    print("MULTI_RESULT " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
