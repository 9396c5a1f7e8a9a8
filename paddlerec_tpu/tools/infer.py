"""Inference/eval CLI — the `tools/infer.py` analog.

Evaluates checkpoints saved per epoch between runner.infer_start_epoch and
runner.infer_end_epoch (reference tools/infer.py:48-199 loop).
"""

from __future__ import annotations

import argparse

from paddlerec_tpu.core.config import load_config, parse_overrides
from paddlerec_tpu.train.trainer import Trainer, logger


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="paddlerec_tpu infer")
    parser.add_argument("-m", "--config_yaml", required=True)
    parser.add_argument("-o", "--opt", nargs="*", default=None)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    config = load_config(args.config_yaml, parse_overrides(args.opt))
    trainer = Trainer(config)
    start = int(config.runner("infer_start_epoch", 0))
    end = int(config.runner("infer_end_epoch", 1))
    results = {}
    for epoch in range(start, end):
        logger.info(f"load model epoch {epoch}")
        metrics = trainer.evaluate(epoch_tag=epoch)
        results[epoch] = metrics
    logger.info(f"inference finished: {results}")
    return results


if __name__ == "__main__":
    main()
