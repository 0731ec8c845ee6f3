#!/usr/bin/env bash
# Package the engine and launch the flagship pipeline via spark-submit
# --py-files (north rule's deployment shape). On a real cluster swap
# --master for yarn/k8s and point --store at an Iceberg-backed path.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${MASTER:-local[8]}"
STORE="${1:-/tmp/streamchange_pipeline_store}"
ZIP=/tmp/streamchange_spark.zip

rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" streamchange_spark -x '*__pycache__*')

exec spark-submit \
    --master "$MASTER" \
    --conf spark.sql.shuffle.partitions=32 \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.session.timeZone=UTC \
    --py-files "$ZIP" \
    "$REPO/tools/run_pipeline.py" --store "$STORE" "${@:2}"
