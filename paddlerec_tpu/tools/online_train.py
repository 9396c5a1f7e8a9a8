"""Online/streaming train CLI — the static_ps_online_trainer.py analog.

    python -m paddlerec_tpu.tools.online_train -m config.yaml \
        -o runner.start_day=20240101 runner.end_day=20240102
"""

from __future__ import annotations

import argparse

from paddlerec_tpu.core.config import load_config, parse_overrides
from paddlerec_tpu.train.online import OnlineTrainer
from paddlerec_tpu.train.trainer import logger


def main(argv=None):
    parser = argparse.ArgumentParser(description="paddlerec_tpu online trainer")
    parser.add_argument("-m", "--config_yaml", required=True)
    parser.add_argument("-o", "--opt", nargs="*", default=None)
    args = parser.parse_args(argv)
    config = load_config(args.config_yaml, parse_overrides(args.opt))
    trainer = OnlineTrainer(config)
    metrics = trainer.run()
    logger.info(f"online training finished: {metrics}")
    return metrics


if __name__ == "__main__":
    main()
