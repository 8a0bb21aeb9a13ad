"""Skew diagnostics: key-distribution and partition-balance reports.

At 10^10-URL scale every keyed exchange (the hostname admission fold,
the seen-set anti-join, LSH band buckets) lives or dies on key balance
— one hot host can pin a whole stage on one task. The engine already
has the MITIGATIONS (AQE skew-join, salted admission fold with the
cap+2 bound, host-bucket salting); this module adds the MEASUREMENT
side: declarative reports to decide WHETHER to salt and by how much,
instead of guessing.

Everything is plain DataFrame aggregation — no collect, no UDF; the
report frames are small (top-K keys / one row per bucket / one summary
row) no matter the input size.

Hash choice: ``hash_fn="md5"`` uses the portable md5 bucket hash
(DuckDB-oracle-checkable, the contract path); ``"xxhash64"`` matches
the JVM's cheap path for production runs. Bucket assignment uses
pmod(h, width) in both cases — the same arithmetic the engine's
repartition/salt helpers use, so the histogram predicts the real
exchange's task sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _bucket_hash(col, hash_fn: str):
    if hash_fn == "xxhash64":
        # unsigned shift keeps the value non-negative for pmod
        return F.shiftrightunsigned(F.xxhash64(col), 1)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hot_keys(
    df: DataFrame, key: str, k: int = 20
) -> DataFrame:
    """Top-k hottest keys with their row share: (key, cnt, share,
    rank). One exchange (the groupBy), then a distributed
    TakeOrdered for the top-k cut — the rank window runs over the k
    surviving rows only (bounded), never over the full key set."""
    counts = df.groupBy(key).agg(F.count("*").cast("long").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_t"))
    topk = (
        counts.orderBy(F.desc("cnt"), F.col(key)).limit(k)
        .crossJoin(F.broadcast(total))
    )
    return topk.select(
        key,
        "cnt",
        F.round(F.col("cnt") / F.col("_t"), 6).alias("share"),
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), F.col(key)))
        .alias("rank"),
    )


def partition_histogram(
    df: DataFrame, key: str, width: int = 32, hash_fn: str = "md5"
) -> DataFrame:
    """Rows per hash-partition for a ``width``-way exchange on ``key``:
    (bucket, rows, n_keys). This is the task-size distribution the
    exchange would produce — a bucket at many-x the mean is the skewed
    task AQE would have to split."""
    b = F.pmod(_bucket_hash(F.col(key), hash_fn), F.lit(width)).cast("int")
    return (
        df.select(b.alias("bucket"), F.col(key))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("rows"),
            F.countDistinct(key).cast("long").alias("n_keys"),
        )
    )


def skew_summary(
    df: DataFrame, key: str, width: int = 32, hash_fn: str = "md5"
) -> DataFrame:
    """One-row report: total rows, distinct keys, the hottest key's
    count and share, bucket-level max/mean imbalance for a
    ``width``-way exchange, and the salt factor that would bring the
    hottest key down to mean-bucket size (the engine's
    ``salt_buckets`` knob; 1 = no salting needed).

    Two aggregations over one per-key count frame; output is a single
    row regardless of input size (a diagnostic, run out-of-band — the
    per-key frame is recomputed rather than cached so the report
    leaves no persisted state behind).
    """
    b = F.pmod(_bucket_hash(F.col(key), hash_fn), F.lit(width)).cast("int")
    counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
    key_stats = counts.agg(
        F.sum("cnt").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_key_rows"),
    )
    bucket_stats = (
        counts.select(b.alias("bucket"), "cnt")
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("rows"))
        .agg(
            F.max("rows").cast("long").alias("max_bucket_rows"),
            F.avg("rows").alias("mean_bucket_rows"),
        )
    )
    return key_stats.crossJoin(F.broadcast(bucket_stats)).select(
        "total_rows",
        "n_keys",
        "max_key_rows",
        F.round(F.col("max_key_rows") / F.col("total_rows"), 6).alias(
            "max_key_share"
        ),
        "max_bucket_rows",
        F.round(
            F.col("max_bucket_rows") / F.col("mean_bucket_rows"), 6
        ).alias("bucket_imbalance"),
        F.greatest(
            F.lit(1),
            F.ceil(
                F.col("max_key_rows")
                / (F.col("total_rows") / F.lit(float(width)))
            ).cast("long"),
        ).alias("recommended_salt"),
    )


def fairness_index(df: DataFrame, key_col: str = "hostname") -> DataFrame:
    """Jain's fairness index (Jain et al. 1984) of the per-key row
    allocation: J = (Σx)² / (n·Σx²) over per-key counts x — 1.0 when
    every key gets the same share, → 1/n when one key takes all. The
    scheduler-health companion to :func:`skew_summary`: run it over a
    wave's ADMITTED rows to check the politeness/budget fold is
    spreading fetches, or over shuffle keys to quantify partition
    balance as one number.

    All inputs to the two divisions are exact integer sums, so the
    doubles are bit-identical across engines — no rounding needed.

    One count shuffle + a 1-row agg. Returns (n_keys, total,
    max_share, jain).
    """
    counts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("x").cast("long").alias("total"),
        F.max("x").cast("long").alias("_mx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("_sq"),
    ).select(
        "n_keys",
        "total",
        (F.col("_mx") / F.col("total")).alias("max_share"),
        (
            (F.col("total") * F.col("total"))
            / (F.col("n_keys") * F.col("_sq"))
        ).alias("jain"),
    )
