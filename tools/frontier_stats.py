"""Sketch-based crawl-state survey: per-host distinct-URL cardinality
(HyperLogLog) and the hottest URL path patterns (count-min) straight
from a crawl state directory — the operational dashboard numbers a
10^10-URL frontier needs WITHOUT an exact distinct/count shuffle of
the whole key space.

Usage:
  python tools/frontier_stats.py --state <state_dir>
      [--table seen_scanned|frontier] [--top N] [--b BITS]
      [--version V]   (time-travel: read the snapshot at version V)

Reads the seen-set (default) or the live frontier via the same
StateStore the engine commits through (so snapshots/time-travel work),
builds the sketches with `operators/sketch.py`, and prints one JSON
line `FRONTIER_STATS {...}` with:
  hosts        – HLL-estimated distinct keys per host (top N by est.)
  hot_patterns – count-min estimates for the N most frequent
                 digit-folded path patterns (trap candidates)

Reference parity: the reference answers "how many URLs has this host
accumulated" with exact Redis counters (`tools/build_redis_cache.py`,
REQUEST_COUNT); at frontier scale those counters become this pair of
mergeable sketches.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None, spark=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True)
    ap.add_argument(
        "--table",
        default="seen_scanned",
        choices=["seen_scanned", "frontier", "host_hll"],
        help="host_hll: finalize the STREAMED register table "
        "(run_foreach_batch_sketch_merge) instead of re-sketching raw "
        "keys — no scan of the key space at all",
    )
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--b", type=int, default=6)
    ap.add_argument("--version", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    if spark is None:
        spark = SparkSession.builder.appName(
            "tspider-frontier-stats"
        ).getOrCreate()

    from tspider_spark.operators.sketch import (
        cms_top_k,
        hll_cardinality,
        hll_estimate,
    )
    from tspider_spark.sources.state import StateStore

    store = StateStore(spark, args.state)
    df = store.read(args.table, version=args.version)
    if args.table == "host_hll":
        # pre-sketched registers: finalize only (b comes from the
        # stream's commit metadata, not the CLI)
        b = int(store.meta().get("hll_b", args.b))
        per_host = (
            hll_estimate(df, b=b, group_col="hostname")
            .orderBy(F.col("n_hll").desc(), F.col("hostname"))
            .limit(args.top)
            .collect()
        )
        hot = []
    else:
        key = "scan_key" if args.table == "seen_scanned" else "url"
        per_host = (
            hll_cardinality(df, group_col="hostname", item_col=key, b=args.b)
            .orderBy(F.col("n_hll").desc(), F.col("hostname"))
            .limit(args.top)
            .collect()
        )
        # digit-folded pattern: the same T2 canonicalization idea the
        # scheduler's scan keys use — hot patterns are crawler-trap bait
        patterns = df.select(
            F.regexp_replace(F.col(key), "[0-9]+", "{d}").alias("url")
        )
        hot = (
            cms_top_k(patterns, item_col="url", k=args.top)
            .orderBy(F.col("n_exact").desc(), F.col("item"))
            .collect()
        )
    out = {
        "table": args.table,
        "version": store.version if args.version is None else args.version,
        "hosts": [
            {"hostname": r["hostname"], "n_hll": r["n_hll"]} for r in per_host
        ],
        "hot_patterns": [
            {"pattern": r["item"], "n_exact": r["n_exact"], "n_cms": r["n_cms"]}
            for r in hot
        ],
    }
    print("FRONTIER_STATS " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
