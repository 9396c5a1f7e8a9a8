#!/bin/bash
# ali-cpp_aitm: fetch the preprocessed dataset from the public
# mirror (the reference's run.sh source) and lay out
# train/ + test/.  Offline fallback: --synth generates
# schema-correct synthetic data where a generator exists.
cd "$(dirname "$0")"
python ../fetch.py --dataset ali-cpp_aitm "$@"
