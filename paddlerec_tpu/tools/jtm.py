"""JTM CLI: alternating tree-model learning.

Parity target: reference models/treebased/jtm/ (tree_learning.py driven
manually after TDM training).  Here one command runs the full loop:

    python -m paddlerec_tpu.tools.jtm -m configs/treebased/jtm/config.yaml \
        -o runner.jtm_rounds=3 hyper_parameters.jtm_gap=7
"""

from __future__ import annotations

import argparse
import sys

from paddlerec_tpu.core.config import load_config, parse_overrides
from paddlerec_tpu.train.trainer import logger


def main(argv=None):
    parser = argparse.ArgumentParser(description="JTM trainer")
    parser.add_argument("-m", "--config_yaml", required=True)
    parser.add_argument("-o", "--opt", nargs="*", default=None)
    args = parser.parse_args(argv)
    config = load_config(args.config_yaml, parse_overrides(args.opt))
    from paddlerec_tpu.models.treebased.jtm import jtm_train

    metrics, tree = jtm_train(config)
    logger.info(
        f"JTM finished: {metrics}; final tree depth {tree.max_level}"
    )
    return metrics


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
