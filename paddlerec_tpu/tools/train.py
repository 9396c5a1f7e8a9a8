"""Train CLI — the `tools/trainer.py` analog.

Usage (same shape as the reference, tools/trainer.py:49-65):

    python -m paddlerec_tpu.tools.train -m models/rank/deepfm/config.yaml \
        -o runner.epochs=1 runner.train_batch_size=512
"""

from __future__ import annotations

import argparse

from paddlerec_tpu.core.config import load_config, parse_overrides
from paddlerec_tpu.train.trainer import Trainer, logger


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="paddlerec_tpu trainer")
    parser.add_argument("-m", "--config_yaml", required=True)
    parser.add_argument(
        "-o", "--opt", nargs="*", default=None, help="key=value config overrides"
    )
    return parser.parse_args(argv)


def maybe_init_distributed():
    """Join the jax.distributed cluster when launched by tools/launch
    (or any launcher exporting JAX_NUM_PROCESSES/JAX_PROCESS_ID)."""
    import os

    nproc = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if nproc > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=nproc,
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )


def main(argv=None):
    args = parse_args(argv)
    maybe_init_distributed()
    config = load_config(args.config_yaml, parse_overrides(args.opt))
    logger.info("config:\n" + config.pretty())
    if bool(config.runner("use_host_table", False)):
        # GPUBox-analog pass loop: host-resident table + per-pass HBM
        # cache (train/host_loop.py)
        from paddlerec_tpu.train.host_loop import HostTableTrainer

        trainer = HostTableTrainer(config)
    elif str(config.runner("sync_mode", "") or "").lower() == "fl":
        # federated rounds over private per-process shards (FL-PS
        # analog, train/fl.py)
        from paddlerec_tpu.train.fl import FLTrainer

        trainer = FLTrainer(config)
    else:
        trainer = Trainer(config)
    metrics = trainer.train()
    logger.info(f"training finished: {metrics}")
    return metrics


if __name__ == "__main__":
    main()
