"""Batch inference from an exported artifact, with a latency report.

The reference's analog is tools/paddle_infer.py (paddle_inference Config,
CopyFromCpu feeds, benchmark hooks via tools/utils/benchmark_utils.py).
Here: load artifact → jit infer_forward → stream batches → latency
percentiles + throughput.

Usage:
    python -m paddlerec_tpu.tools.predict --export_dir exported_model \
        --data_dir data/sample_data/train --batch_size 512
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from paddlerec_tpu.tools.export import load_exported
from paddlerec_tpu.train.trainer import logger


def run_predict(export_dir: str, data_dir: str, batch_size: int,
                warmup: int = 1):
    model_def, params = load_exported(export_dir)
    # pin the params on device ONCE: checkpoint loads hand back host
    # (numpy) leaves, and jit re-transfers host operands on EVERY call —
    # for a 10^6-row table that is ~40 MB/batch over the feed link,
    # dwarfing the forward itself
    params = jax.device_put(params)
    infer = jax.jit(model_def.infer_forward)

    dataset = model_def.make_dataset(data_dir, batch_size) if hasattr(
        model_def, "make_dataset"
    ) else None
    if dataset is None:
        from paddlerec_tpu.data.schema import schema_from_config
        from paddlerec_tpu.data.slot_reader import SlotDataset, list_data_files

        schema = schema_from_config(model_def.config)
        dataset = SlotDataset(
            list_data_files(data_dir), schema, batch_size, drop_last=False
        )

    latencies = []
    total = 0
    outputs = []
    for i, batch in enumerate(dataset):
        batch = jax.tree.map(jnp.asarray, batch)
        t0 = time.time()
        aux = infer(params, batch)
        preds = aux.get("predictions")
        if preds is None:
            # multitask/regression/match models name their outputs
            # differently — take the first known output key
            for key in ("probs", "scores", "ctr", "outputs", "sim_pos"):
                if key in aux:
                    preds = aux[key]
                    break
        if preds is not None:
            arr = np.asarray(preds)  # host readback = honest sync
            if "mask" in batch:
                # drop mask-padded tail rows so prediction lines align
                # 1:1 with input instances
                mask = np.asarray(batch["mask"]).reshape(-1) > 0
                if arr.shape[0] == mask.shape[0]:
                    arr = arr[mask]
            outputs.append(arr)
        else:
            jax.block_until_ready(aux)
        rows = int(batch["mask"].sum()) if "mask" in batch else batch_size
        full = int(np.asarray(batch["label"]).shape[0] if "label" in batch
                   else rows) == batch_size
        # a short tail batch changes the traced shape and pays a fresh
        # compile — predict it, but keep it out of the steady-state
        # latency percentiles (the reference's benchmark_utils likewise
        # reports per-batch steady state)
        if i >= warmup and full:
            latencies.append(time.time() - t0)
            total += rows  # only timed rows count toward qps

    report = {}
    if latencies:
        lat = np.array(latencies) * 1000
        report = {
            "batches": len(latencies),
            "avg_ms": float(lat.mean()),
            "p50_ms": float(np.percentile(lat, 50)),
            "p90_ms": float(np.percentile(lat, 90)),
            "p99_ms": float(np.percentile(lat, 99)),
            "qps": total / max(sum(latencies), 1e-9),
        }
        logger.info(
            "inference benchmark: "
            + ", ".join(f"{k}={v:.2f}" for k, v in report.items())
        )
    return outputs, report


def main(argv=None):
    parser = argparse.ArgumentParser(description="batch predict")
    parser.add_argument("--export_dir", required=True)
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--batch_size", type=int, default=512)
    args = parser.parse_args(argv)
    run_predict(args.export_dir, args.data_dir, args.batch_size)


if __name__ == "__main__":
    main()
