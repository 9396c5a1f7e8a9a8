#!/bin/bash
# TIPC certification entry (reference test_tipc/test_train_inference_python.sh)
# usage: bash test_tipc/test_train_inference_python.sh <config_txt> <mode>
set -u
CONFIG=${1:?usage: $0 <config_txt> [mode]}
MODE=${2:-lite_train_lite_infer}
python -m paddlerec_tpu.tools.tipc "$CONFIG" "$MODE"
