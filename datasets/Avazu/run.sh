#!/bin/bash
# Avazu: fetch the preprocessed dataset from the public
# mirror (the reference's run.sh source) and lay out
# train/ + test/.  Offline fallback: --synth generates
# schema-correct synthetic data where a generator exists.
# NOTE: no public mirror — the reference builds this dataset locally; see manifest.ref_scripts.
cd "$(dirname "$0")"
python ../fetch.py --dataset Avazu "$@"
