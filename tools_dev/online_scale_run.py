"""20M-row online-loop measurement (doc/online_learning.md §Verified):
2 days x 2 passes x 5M rows through the REAL OnlineTrainer — join-time
eval, touched-row deltas, base models, donefiles — reporting wall time
and end-to-end rows/s.  Round 3 wires the wire+superbatch fast feed into
train_pass; this run verifies the production loop actually feeds at the
disk-fed bench rate (VERDICT r2 item 2 done-criterion).

usage: python tools_dev/online_scale_run.py [corpus_dir] [out_dir]
"""
import json
import os
import shutil
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paddlerec_tpu.core.config import Config  # noqa: E402
from paddlerec_tpu.train.online import OnlineTrainer  # noqa: E402


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/criteo_v4"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/online_scale"
    meta = json.load(open(os.path.join(corpus, "meta.json")))
    shutil.rmtree(out, ignore_errors=True)
    data_root = os.path.join(out, "data")
    parts = sorted(
        f for f in os.listdir(os.path.join(corpus, "train"))
        if f.endswith(".bin")
    )
    # 2 days x 2 passes x 5 parts (1M rows each)
    need = 20
    assert len(parts) >= need, (len(parts), need)
    i = 0
    for day in ("20240101", "20240102"):
        for hhmm in ("0000", "1200"):
            d = os.path.join(data_root, day, hhmm)
            os.makedirs(d, exist_ok=True)
            for _ in range(5):
                os.symlink(
                    os.path.join(corpus, "train", parts[i]),
                    os.path.join(d, parts[i]),
                )
                i += 1
    cfg = Config({
        "runner.model": "rank.deepfm",
        "runner.train_data_dir": data_root,
        "runner.model_save_path": os.path.join(out, "model"),
        "runner.train_batch_size": 8192,
        "runner.infer_batch_size": 8192,
        "runner.print_interval": 500,
        "runner.days": "20240101 20240102",
        "runner.split_interval": 720,
        "runner.split_per_pass": 1,
        "runner.checkpoint_per_pass": 2,
        "runner.save_delta_frequency": 1,
        "runner.wire_format": "compact",
        "runner.feed_superbatch": 16,
        "hyper_parameters.sparse_inputs_slots": 27,
        "hyper_parameters.sparse_feature_number": meta["vocab"],
        "hyper_parameters.sparse_feature_dim": 9,
        "hyper_parameters.dense_input_dim": 13,
        "hyper_parameters.fc_sizes": [512, 256, 128, 32],
        "hyper_parameters.sparse_feature_dtype": "bfloat16",
        "hyper_parameters.optimizer.class": "Adam",
        "hyper_parameters.optimizer.learning_rate": 0.001,
    })
    t0 = time.time()
    trainer = OnlineTrainer(cfg)
    trainer.run()
    wall = time.time() - t0
    rows = 20_000_000
    deltas = [d for d in os.listdir(os.path.join(out, "model"))
              if d.startswith("delta_")]
    # the loop also join-time-evals every pass pre-train, so the honest
    # end-to-end device row rate covers train+eval rows
    print("ONLINE_SCALE " + json.dumps({
        "rows": rows, "wall_s": round(wall, 1),
        "rows_per_s": round(rows / wall, 0),
        "e2e_rows_per_s_incl_eval": round(2 * rows / wall, 0),
        "deltas_published": len(deltas),
        # per-phase attribution (VERDICT r3 item 4): prepare (parse +
        # shuffle, overlapped by prefetch), infer (join-time eval +
        # the single staging transfer + row observation), train (replay
        # from HBM), publish (checkpoint/delta/base)
        "phases": {k: round(v, 1)
                   for k, v in sorted(trainer.phase_times.items())},
    }), flush=True)


if __name__ == "__main__":
    main()
