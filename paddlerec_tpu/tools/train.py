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


def main(argv=None):
    args = parse_args(argv)
    config = load_config(args.config_yaml, parse_overrides(args.opt))
    logger.info("config:\n" + config.pretty())
    trainer = Trainer(config)
    metrics = trainer.train()
    logger.info(f"training finished: {metrics}")
    return metrics


if __name__ == "__main__":
    main()
