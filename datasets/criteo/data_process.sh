#!/bin/bash
# raw Criteo TSV -> slot format via the C++ pipe parser
set -e
IN=${1:?usage: $0 <raw_tsv_dir> <out_dir>}
OUT=${2:?usage: $0 <raw_tsv_dir> <out_dir>}
mkdir -p "$OUT"
python - <<'PY'
from paddlerec_tpu.native import build_criteo_parser
print(build_criteo_parser())
PY
PARSER=$(python -c "from paddlerec_tpu.native import build_criteo_parser; print(build_criteo_parser())")
i=0
for f in "$IN"/*; do
  "$PARSER" < "$f" > "$OUT/part-$i"
  i=$((i+1))
done
