#!/usr/bin/env bash
# Package the engine for spark-submit --py-files deployment on a cluster.
#   ./scripts/build_pyfiles.sh            -> dist/oshdb_spark.zip
# Submit example (multi-executor cluster):
#   spark-submit --master yarn --deploy-mode cluster \
#     --num-executors "$N" --executor-cores 4 --executor-memory 8g \
#     --conf spark.sql.adaptive.enabled=true \
#     --conf spark.sql.adaptive.skewJoin.enabled=true \
#     --py-files dist/oshdb_spark.zip \
#     scripts/run_pipeline.py --docs "$DOCS_TABLE" \
#       --bbox -60,-40,60,40 --timestamps 1262304000,1325376000 \
#       --out "$OUT_DIR" --buckets 64
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/oshdb_spark.zip
zip -qr dist/oshdb_spark.zip oshdb_spark -x '*__pycache__*'
echo "wrote dist/oshdb_spark.zip"
