#!/bin/bash
# Criteo Display Advertising Challenge (45.8M rows).
# Public mirror used by the reference:
#   https://fleet.bj.bcebos.com/ctr_data/raw (slot_train_data_full / slot_test_data_full)
# Original: https://ailab.criteo.com/ressources/
set -e
OUT=${1:-raw}
mkdir -p "$OUT"
echo ">> downloading criteo (requires network)"
wget -q -P "$OUT" https://fleet.bj.bcebos.com/ctr_data/raw/slot_train_data_full.tar.gz
wget -q -P "$OUT" https://fleet.bj.bcebos.com/ctr_data/raw/slot_test_data_full.tar.gz
tar -xzf "$OUT"/slot_train_data_full.tar.gz -C "$OUT"
tar -xzf "$OUT"/slot_test_data_full.tar.gz -C "$OUT"
echo ">> done. For raw-TSV sources, preprocess with the native parser:"
echo "   native/build/criteo_parser < day_0.tsv > part-0"
