"""Trap report — inspect the engine's accumulated per-host pattern
pressure (CrawlConfig.trap_min_urls feature; host_pattern_stats state
table) and list the hosts the current thresholds would flag, alongside
the hosts already on the runtime blocklist.

Usage: python tools/trap_report.py STATE_DIR [--min-urls N]
       [--max-patterns-per-url R] [--top K]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None, spark=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("state_dir")
    ap.add_argument("--min-urls", type=int, default=None,
                    help="override the stored config threshold")
    ap.add_argument("--max-patterns-per-url", type=float, default=None)
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from tspider_spark.config import CrawlConfig
    from tspider_spark.session import get_spark
    from tspider_spark.sources.state import StateStore

    spark = spark or get_spark("trap-report", master="local[2]",
                               shuffle_partitions=2)
    store = StateStore(spark, args.state_dir)
    meta = store.meta()
    cfg = CrawlConfig.from_meta(meta.get("config", {}))
    min_urls = args.min_urls if args.min_urls is not None else (
        cfg.trap_min_urls or 100
    )
    ratio = (
        args.max_patterns_per_url
        if args.max_patterns_per_url is not None
        else cfg.trap_max_patterns_per_url
    )

    stats = store.read("host_pattern_stats").withColumn(
        "patterns_per_url",
        F.round(F.col("n_patterns") / F.col("n_urls"), 6),
    )
    flagged = stats.filter(
        (F.col("n_urls") >= min_urls)
        & (F.col("n_patterns") > F.lit(float(ratio)) * F.col("n_urls"))
    )
    rows = (
        flagged.orderBy(F.desc("patterns_per_url"), "hostname")
        .limit(args.top)
        .collect()
    )
    print(f"blocklist: {sorted(cfg.blocklist)}")
    print(f"thresholds: min_urls={min_urls} max_patterns_per_url={ratio}")
    for r in rows:
        mark = "BLOCKED" if r["hostname"] in cfg.blocklist else "flag"
        print(
            f"{mark:8s} {r['hostname']}: urls={r['n_urls']} "
            f"patterns={r['n_patterns']} ppu={r['patterns_per_url']}"
        )
    if not rows:
        print("no hosts over threshold")
    return [r["hostname"] for r in rows]


if __name__ == "__main__":
    main()
