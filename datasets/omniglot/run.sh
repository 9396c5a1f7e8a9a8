#!/bin/bash
# See datasets/readme.md. Offline synthetic generator:
#   python -m datasets.synthesize omniglot ${1:-data}
echo "download instructions: see the reference datasets/omniglot; offline synth available"
