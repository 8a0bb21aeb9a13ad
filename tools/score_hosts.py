"""Derive (hostname, priority) for authority-mode crawling from the
documents table itself — the feedback loop the reference never closes:
crawl → build the host link graph from what was fetched → score hosts
→ feed `submit_crawl --host-priorities` on the next run / resume.

Usage:
  python tools/score_hosts.py --documents <parquet> --out <parquet_dir>
      [--algo pagerank|opic|trustrank|hits] [--iters N]
      [--seeds host1,host2]   (trustrank only: the trusted seed hosts)

The link graph comes from the REAL extraction operator (every doc is
its own depth-0 task; extract_candidates applies the full E1-E8
pipeline), hosts from the same URL canonicalization the scheduler
uses, and the dense priorities from `rank_hosts_by_score` — so the
scores rank exactly the hosts the crawl would schedule. For `hits`
the hub score is used (hubs are where a crawler harvests the most new
URLs per fetch).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def host_edges(docs):
    """Distinct (src, dst) host pairs from the documents' own links."""
    from pyspark.sql import functions as F

    from tspider_spark.functions.urlfuncs import with_url_info
    from tspider_spark.operators.extract import extract_candidates

    tasks = docs.select(
        F.col("doc_id").alias("task_url"),
        F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("task_rank"),
        "doc_id",
        "spans",
    )
    cands = extract_candidates(tasks).select("task_url", "url")
    src = with_url_info(cands, "task_url", out="su")
    both = with_url_info(src, "url", out="du")
    return (
        both.filter(F.col("su.valid") & F.col("du.valid"))
        .select(
            F.col("su.hostname").alias("src"),
            F.col("du.hostname").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def main(argv=None, spark=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--algo",
        default="pagerank",
        choices=["pagerank", "opic", "trustrank", "hits"],
    )
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--seeds", default=None,
                    help="comma-separated trusted hosts (trustrank)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    if spark is None:
        spark = SparkSession.builder.appName(
            "tspider-score-hosts"
        ).getOrCreate()

    from tspider_spark.operators import graph as G
    from tspider_spark.operators.schedule import rank_hosts_by_score

    edges = host_edges(spark.read.parquet(args.documents))
    if args.algo == "pagerank":
        scores = G.pagerank(edges, iters=args.iters).select(
            F.col("node").alias("hostname"), F.col("rank").alias("score")
        )
    elif args.algo == "opic":
        scores = G.opic(edges, rounds=args.iters).select(
            F.col("node").alias("hostname"),
            F.col("importance").alias("score"),
        )
    elif args.algo == "hits":
        scores = G.hits(edges, iters=args.iters).select(
            F.col("node").alias("hostname"), F.col("hub").alias("score")
        )
    else:
        if not args.seeds:
            sys.exit("--algo trustrank requires --seeds host1,host2,...")
        seeds = spark.createDataFrame(
            [(s.strip(),) for s in args.seeds.split(",") if s.strip()],
            "node string",
        )
        scores = G.trustrank(edges, seeds, iters=args.iters).select(
            F.col("node").alias("hostname"), F.col("trust").alias("score")
        )

    pr = rank_hosts_by_score(scores)
    pr.write.mode("overwrite").parquet(args.out)
    n = pr.count()
    print(f"SCORE_HOSTS {{\"algo\": \"{args.algo}\", \"hosts\": {n}, "
          f"\"out\": \"{args.out}\"}}")
    return n


if __name__ == "__main__":
    main()
