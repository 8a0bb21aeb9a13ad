#!/usr/bin/env bash
# North-rule deployment + scaling shape, literally: package the engine
# and run the timed crawl wave via spark-submit --py-files at TWO
# cluster sizes (N and 4N cores) over the SAME corpus, then report
# throughput at both levels, the raw scaling efficiency, and the
# cross-size parity digests (admitted count + seen-set digest +
# crawl-order digest must be identical — the north rule's exact
# crawl-order / URL-seen match clause, machine-checked).
#
#   tools/run_scaling_submit.sh [lo_cores] [hi_cores] [n_docs]
#
# Defaults 4 -> 16 (the pair that does not saturate a 32-thread box's
# memory channels — see BASELINE.md's scaling-evidence methodology).
# Prints one SCALING_SUBMIT_RESULT {...} JSON line.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LO="${1:-4}"
HI="${2:-16}"
NDOCS="${3:-4000000}"

ZIP="$(mktemp -d)/tspider_spark.zip"
(cd "$REPO" && python -m zipfile -c "$ZIP" tspider_spark/)
CORPUS="$(mktemp -d)/docs"

run_level() {
    # driver memory must be set at submit time (the JVM is already up
    # before any session conf applies) — the 1g spark-submit default
    # OOMs on the 4M-doc corpus build
    local cores=$1 log
    log="$(mktemp)"
    TSPIDER_BENCH_DIGEST=1 TSPIDER_BENCH_DOCS="$NDOCS" \
    /opt/spark/bin/spark-submit \
        --master "local[$cores]" \
        --driver-memory "${TSPIDER_DRIVER_MEM:-8g}" \
        --conf spark.ui.enabled=false \
        --py-files "$ZIP" \
        "$REPO/tspider_spark/bench_worker.py" \
        --cores "$cores" --corpus-path "$CORPUS" \
        2>"$log" | grep '^BENCH_RESULT ' | sed 's/^BENCH_RESULT //' \
        || { echo "worker at $cores cores emitted no BENCH_RESULT;" \
                  "last stderr:" >&2; tail -5 "$log" >&2; return 1; }
}

LO_JSON="$(run_level "$LO")"
HI_JSON="$(run_level "$HI")"

python3 - "$LO" "$HI" "$LO_JSON" "$HI_JSON" <<'EOF'
import json
import sys

lo_c, hi_c = int(sys.argv[1]), int(sys.argv[2])
lo, hi = json.loads(sys.argv[3]), json.loads(sys.argv[4])
eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / (hi_c / lo_c)
parity = all(
    lo.get(k) == hi.get(k)
    for k in ("admitted", "set_digest", "order_digest")
)
print("SCALING_SUBMIT_RESULT " + json.dumps({
    "cores_lo": lo_c,
    "cores_hi": hi_c,
    "lo_urls_per_sec": lo["urls_per_sec"],
    "hi_urls_per_sec": hi["urls_per_sec"],
    "efficiency": round(eff, 3),
    "parity_match": parity,
    "admitted": lo.get("admitted"),
    "set_digest": lo.get("set_digest"),
    "order_digest": lo.get("order_digest"),
}))
if not parity:
    sys.exit(1)
EOF
