"""Training-shard JSONL sink: turn a curated corpus (a `run_curate.py`
output directory, or any parquet with a deterministic shard/sequence
assignment) into size-bounded JSONL shard directories — the handoff
format training loaders consume.

Usage:
  python tools/export_shards.py <curate_out_or_parquet> <dest>
      [--stage packed] [--shard-col seq_first] [--shards-per-file 64]
      [--columns doc_id,text,...]

Each output row lands under `dest/shard=<n>/part-*.json` (one JSON
object per line), with `shard = shard_col // shards_per_file` — the
grouping keeps file counts sane when the packer emits fine-grained
sequence ids. The write is a single `partitionBy` JSON sink: shard
assignment was already computed deterministically upstream
(`pack_sequences`/`pack_shards`), so the export is a pure map —
re-running it can never reshuffle documents between shards.

Returns (prints) one JSON line `EXPORT_SHARDS {...}` with row/shard
counts. Reference parity: the reference's exports are flat URL lists
(`tools/urls_for_pocsuite.py`); a training pipeline's sink is sharded
JSONL, so this is the §2.9 extension of K3.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None, spark=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dest")
    ap.add_argument("--stage", default="packed")
    ap.add_argument("--shard-col", default="seq_first")
    ap.add_argument("--shards-per-file", type=int, default=64)
    ap.add_argument("--columns", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    if spark is None:
        spark = SparkSession.builder.appName(
            "tspider-export-shards"
        ).getOrCreate()

    src = Path(args.src)
    path = src / args.stage if (src / args.stage).is_dir() else src
    df = spark.read.parquet(str(path))
    if args.columns:
        keep = [c.strip() for c in args.columns.split(",")]
        df = df.select(*dict.fromkeys(keep + [args.shard_col]))
    out = df.withColumn(
        "shard",
        (F.col(args.shard_col) / args.shards_per_file).cast("long"),
    )
    out.write.mode("overwrite").partitionBy("shard").json(args.dest)

    n_rows = out.count()
    n_shards = out.select("shard").distinct().count()
    print(
        "EXPORT_SHARDS "
        + json.dumps({"rows": n_rows, "shards": n_shards, "dest": args.dest})
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
