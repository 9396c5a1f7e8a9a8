#!/bin/bash
# See datasets/readme.md. Offline synthetic generator:
#   python -m datasets.synthesize census ${1:-data}
echo "download instructions: see the reference datasets/census; offline synth available"
