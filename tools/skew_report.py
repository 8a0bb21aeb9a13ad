"""Skew report — key-distribution diagnostics for any keyed exchange.

Reads a parquet table (a frontier snapshot, a candidates dump, any
keyed frame), reports the one-row skew summary, the top-K hottest
keys, and the task-size histogram a WIDTH-way exchange on KEY would
produce, plus the salt factor the engine's salted admission fold
would need (CrawlConfig.salt_buckets).

Usage: python tools/skew_report.py PARQUET_PATH KEY
       [--width N] [--top K] [--histogram]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None, spark=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path")
    ap.add_argument("key")
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--histogram", action="store_true")
    args = ap.parse_args(argv)

    from tspider_spark.operators.diagnose import (
        hot_keys,
        partition_histogram,
        skew_summary,
    )
    from tspider_spark.session import get_spark

    spark = spark or get_spark(
        "skew-report", master="local[4]", shuffle_partitions=4
    )
    df = spark.read.parquet(args.path)
    if args.key not in df.columns:
        raise SystemExit(f"column {args.key!r} not in {df.columns}")

    s = skew_summary(df, args.key, width=args.width).collect()[0]
    print(
        f"rows={s.total_rows} keys={s.n_keys} "
        f"max_key_rows={s.max_key_rows} (share {s.max_key_share}) "
        f"bucket_imbalance={s.bucket_imbalance} "
        f"recommended_salt={s.recommended_salt}"
    )
    print(f"top {args.top} keys:")
    for r in hot_keys(df, args.key, k=args.top).collect():
        print(f"  {r.rank:>3}  {r[args.key]}  rows={r.cnt}  share={r.share}")
    if args.histogram:
        print(f"{args.width}-way exchange histogram:")
        for r in (
            partition_histogram(df, args.key, width=args.width)
            .orderBy("bucket")
            .collect()
        ):
            print(f"  bucket {r.bucket:>4}  rows={r.rows}  keys={r.n_keys}")
    return s


if __name__ == "__main__":
    main()
