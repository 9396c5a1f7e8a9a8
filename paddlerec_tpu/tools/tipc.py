"""TIPC: train-infer certification harness.

Parity target: reference test_tipc/test_train_inference_python.sh —
per-model parameter files declare the train command and its per-mode
values (``key:modeA=v1|modeB=v2``); the harness runs the
train → export → infer chain for the requested mode and records
"Run successfully / Run failed" per step in
``test_tipc/output/results_<mode>.log`` (the reference's status_log
contract, test_train_inference_python.sh:170-207).

Config txt grammar (a cleaned subset of the reference's):

    model_name:dnn
    runner.model:rank.dnn
    runner.train_data_dir:test_tipc/data/train
    runner.epochs:lite_train_lite_infer=1|whole_train_whole_infer=4
    runner.train_batch_size:lite_train_lite_infer=16

Any ``a.b.c`` key becomes a config override; per-mode values are chosen
by the active mode (fall back to the raw value when no ``=`` pairs).

Usage:
    python -m paddlerec_tpu.tools.tipc test_tipc/configs/dnn/train_infer_python.txt lite_train_lite_infer
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback
from typing import Any, Dict

MODES = (
    "lite_train_lite_infer",
    "lite_train_whole_infer",
    "whole_train_whole_infer",
    "whole_infer",
)


def parse_config_txt(path: str, mode: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("#", "=")) or line == "##":
                continue
            key, _, value = line.partition(":")
            key, value = key.strip(), value.strip()
            if not key or value in ("null", ""):
                continue
            if "=" in value and "|" in value or "=" in value and any(
                value.startswith(m + "=") for m in MODES
            ):
                chosen = None
                for part in value.split("|"):
                    m, _, v = part.partition("=")
                    if m == mode:
                        chosen = v
                if chosen is None:
                    continue
                value = chosen
            out[key] = value
    return out


def run_mode(config_txt: str, mode: str, output_dir: str = "test_tipc/output"):
    from paddlerec_tpu.core.config import coerce_value
    from paddlerec_tpu.uapi import RankModel

    spec = parse_config_txt(config_txt, mode)
    model_name = spec.pop("model_name", "model")
    overrides = {
        k: coerce_value(v) for k, v in spec.items() if "." in k
    }
    run_model = overrides.get("runner.model", f"rank.{model_name}")

    os.makedirs(output_dir, exist_ok=True)
    log_path = os.path.join(output_dir, f"results_python_{mode}.log")
    statuses = []

    def status(step: str, ok: bool, detail: str = ""):
        line = (
            f"Run successfully with command - {step}!"
            if ok
            else f"Run failed with command - {step}! {detail}"
        )
        statuses.append((step, ok))
        with open(log_path, "a") as f:
            f.write(line + "\n")
        print(line)

    model = RankModel(run_model, config=overrides)
    save_dir = os.path.join(output_dir, f"{model_name}_{mode}_model")
    export_dir = os.path.join(output_dir, f"{model_name}_{mode}_export")
    infer_dir = os.path.join(output_dir, f"{model_name}_{mode}_infer")

    t0 = time.time()
    # train (skipped in whole_infer mode, matching the reference matrix)
    last_ckpt = None
    if mode != "whole_infer":
        try:
            metrics = model.train(
                save_dir=save_dir,
                config_overrides={"runner.use_auc": True},
            )
            epochs = int(overrides.get("runner.epochs", 1))
            last_ckpt = os.path.join(save_dir, str(epochs - 1))
            status(f"train {model_name}", True)
            print(f"train metrics: {metrics}")
        except Exception as e:  # noqa: BLE001 - harness records any failure
            status(f"train {model_name}", False, repr(e))
            traceback.print_exc()
    # export
    try:
        model.export(last_ckpt, export_dir)
        status(f"export {model_name}", True)
    except Exception as e:  # noqa: BLE001
        status(f"export {model_name}", False, repr(e))
        traceback.print_exc()
    # infer from the exported artifact
    try:
        data = overrides.get(
            "runner.test_data_dir", overrides.get("runner.train_data_dir")
        )
        out = model.infer(
            export_dir, data, infer_dir,
            batch_size=int(overrides.get("runner.infer_batch_size", 16)),
        )
        n = sum(1 for _ in open(out))
        status(f"infer {model_name}", n > 0, f"{n} predictions")
    except Exception as e:  # noqa: BLE001
        status(f"infer {model_name}", False, repr(e))
        traceback.print_exc()

    elapsed = time.time() - t0
    ok = all(s for _, s in statuses)
    print(f"TIPC {model_name} [{mode}] {'PASSED' if ok else 'FAILED'} "
          f"in {elapsed:.1f}s — log: {log_path}")
    return ok


def main(argv=None):
    parser = argparse.ArgumentParser(description="TIPC certification")
    parser.add_argument("config_txt")
    parser.add_argument("mode", nargs="?", default="lite_train_lite_infer",
                        choices=MODES)
    parser.add_argument("--output_dir", default="test_tipc/output")
    args = parser.parse_args(argv)
    return 0 if run_mode(args.config_txt, args.mode, args.output_dir) else 1


if __name__ == "__main__":
    sys.exit(main())
