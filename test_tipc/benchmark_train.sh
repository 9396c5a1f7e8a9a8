#!/bin/bash
# Perf-CI benchmark matrix over EVERY TIPC config (reference
# test_tipc/benchmark_train.sh): each config's benchmark.* sweep runs
# with warmup excluded and >=50 timed steps per cell; a >20% ips drop
# vs the committed benchmark_train_<model>.json (in the TRACKED
# test_tipc/benchmark_records/) FAILS that model, and this driver
# exits non-zero if any model failed.  Run artifacts (including any
# regression findings — regressed runs never overwrite the tracked
# baseline) land in test_tipc/output/, which the summary aggregates
# into test_tipc/output/benchmark_summary.json.
#
# usage: bash test_tipc/benchmark_train.sh [--cpu N] [config_txt ...]
set -u
cd "$(dirname "$0")/.."
CPU_ARGS=()
if [ "${1:-}" = "--cpu" ]; then
  CPU_ARGS=(--cpu "$2")
  shift 2
fi
CONFIGS=("$@")
if [ ${#CONFIGS[@]} -eq 0 ]; then
  CONFIGS=(test_tipc/configs/*/train_infer_python.txt)
fi
FAIL=0
for cfg in "${CONFIGS[@]}"; do
  # ${arr[@]+...}: expanding an empty array under `set -u` errors on
  # bash < 4.4
  python -m paddlerec_tpu.tools.tipc "$cfg" benchmark_train \
    ${CPU_ARGS[@]+"${CPU_ARGS[@]}"} || FAIL=1
done
python -m paddlerec_tpu.tools.tipc_benchmark_summary \
  test_tipc/output || FAIL=1
exit $FAIL
