#!/bin/bash
# See datasets/readme.md. Offline synthetic generator:
#   python -m datasets.synthesize movielens_pinterest_NCF ${1:-data}
echo "download instructions: see the reference datasets/movielens_pinterest_NCF; offline synth available"
