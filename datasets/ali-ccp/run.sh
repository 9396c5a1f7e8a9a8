#!/bin/bash
# See datasets/readme.md. Offline synthetic generator:
#   python -m datasets.synthesize aliccp ${1:-data}
echo "download instructions: see the reference datasets/ali-ccp; offline synth available"
