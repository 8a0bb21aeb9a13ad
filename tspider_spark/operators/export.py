"""Result-store export operators (SURVEY.md §2.7 K3-K5) and state
rebuild tools (S6).

The reference exports via mongoexport + ad-hoc scripts
(tools/extract_field_from_mongoexport.py:31-43,
tools/urls_for_pocsuite.py:28-41); here they are trivial DataFrame
projections over the committed ``results`` table — included so a
reference user has a 1:1 replacement for each tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# T9 — headers the parse step strips from intercepted request records
# (spider.py:111-113)
DROPPED_HEADERS = ("Content-Length", "User-Agent", "Accept")


def project_headers(df: DataFrame, col: str = "headers") -> DataFrame:
    """T9 header projection as a JVM map_filter (the corpus carries
    pre-cleaned headers; this is the operator a live-header source
    would need)."""
    drop = ", ".join(f"'{h}'" for h in DROPPED_HEADERS)
    return df.withColumn(
        col, F.expr(f"map_filter({col}, (k, v) -> k not in ({drop}))")
    )


def export_urls(results: DataFrame) -> DataFrame:
    """K3/K5 — one-column URL export (the mongoexport field pull)."""
    return results.select("url")


def export_fields(results: DataFrame, fields: list) -> DataFrame:
    """K4 — field-projected export (mongo find(query, fields))."""
    return results.select(*fields)


def urls_for_pocsuite(results: DataFrame) -> DataFrame:
    """K6 — first URL per (netloc-ish hostname, pattern), the pocsuite
    dedupe tool (tools/urls_for_pocsuite.py:28-41)."""
    w = Window.partitionBy("hostname", "pattern").orderBy("save_order")
    return (
        results.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("hostname", "pattern", "url")
    )


def merge_results(store, new_results: DataFrame) -> int:
    """K2 — the exists-check-before-insert fallback
    (mongo_utils.py:59-74, used when the Redis saved-cache was lost):
    idempotent upsert of result rows keyed by ``(method, pattern)``.
    Implemented as an anti-join against the committed ``results`` table
    followed by an atomic append — the parquet+manifest stand-in for an
    Iceberg ``MERGE INTO``. Returns the number of rows inserted;
    re-running with the same input inserts zero."""
    existing = store.read("results").select("method", "pattern")
    # deterministic winner per key: the reference's exists-check keeps
    # the first-encountered row, so pick min save_order (nulls last),
    # not dropDuplicates' arbitrary row — re-running over differently
    # partitioned/ordered inputs must commit identical contents
    w = Window.partitionBy("method", "pattern").orderBy(
        F.col("save_order").asc_nulls_last(), F.col("url")
    )
    fresh = (
        new_results.join(existing.distinct(), ["method", "pattern"], "left_anti")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .cache()
    )
    n = fresh.count()
    if n:
        store.commit(appends={"results": fresh})
    fresh.unpersist()
    return n


def rebuild_seen_saved(results: DataFrame) -> DataFrame:
    """S6 — rebuild the saved-set from the result store
    (tools/build_redis_cache.py:23-30): distinct '{method}-{pattern}'."""
    return results.select(
        F.concat("method", F.lit("-"), "pattern").alias("saved_key")
    ).distinct()
