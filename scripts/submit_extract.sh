#!/usr/bin/env bash
# Cluster launch wrapper (north_rule: spark-submit --py-files job).
# Usage: scripts/submit_extract.sh <input> <output-root> [extra run_extract args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="$1"; OUTPUT="$2"; shift 2

ZIP=$(python - <<PY
import sys
sys.path.insert(0, "${REPO}/src")
from sparkextract.spark.session import build_pyfiles_zip
print(build_pyfiles_zip())
PY
)

exec spark-submit \
  --master "${SPARK_MASTER:-local[*]}" \
  --py-files "${ZIP}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.parquet.compression.codec=zstd \
  "${REPO}/scripts/run_extract.py" \
  --input "${INPUT}" --output "${OUTPUT}" "$@"
