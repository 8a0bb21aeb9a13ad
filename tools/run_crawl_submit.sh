#!/usr/bin/env bash
# Package the engine and run a crawl via spark-submit --py-files
# (north_rule deployment shape). Defaults drive the deterministic
# synthetic corpus end-to-end on local[8]; pass a different --master
# plus --documents/--seeds for a real run.
#
#   tools/run_crawl_submit.sh [master] [state_dir] [extra submit args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[8]}"
STATE="${2:-$(mktemp -d)/crawl_state}"
shift $(( $# > 2 ? 2 : $# )) || true

ZIP="$(mktemp -d)/tspider_spark.zip"
(cd "$REPO" && python -m zipfile -c "$ZIP" tspider_spark/)

exec /opt/spark/bin/spark-submit \
    --master "$MASTER" \
    --conf spark.sql.shuffle.partitions=8 \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.ui.enabled=false \
    --py-files "$ZIP" \
    "$REPO/tspider_spark/submit_crawl.py" \
    --documents synthetic --state "$STATE" --tld "$@"
