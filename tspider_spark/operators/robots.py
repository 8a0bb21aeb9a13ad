"""robots.txt scoping + crawl-delay politeness (north_rule extension;
FIXTURES.md §A4 — NOT present in the reference, which fetches
unconditionally; an empty rules table preserves reference parity).

Rules table: ``robots(host string, disallow_prefixes array<string>,
crawl_delay_ms int)``. Rules are broadcast to executors; the disallow
check is a JVM ``exists`` over the prefix array (no Python), and
crawl_delay scales each task's politeness slot into a planned fetch
offset so executors can pace same-host requests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("disallow_prefixes", ArrayType(StringType())),
        StructField("crawl_delay_ms", IntegerType()),
    ]
)


def robots_filter(
    cands: DataFrame, robots: DataFrame, host_col: str = "hostname",
    path_col: str = "u.path",
) -> DataFrame:
    """Drop candidates whose path starts with any disallow prefix for
    their host. Broadcast join; hosts without rules pass."""
    r = F.broadcast(robots.select(
        F.col("host").alias("_rhost"), "disallow_prefixes"
    ))
    joined = cands.join(r, F.col(host_col) == F.col("_rhost"), "left")
    path = F.col(path_col)
    disallowed = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array()),
        lambda p: path.startswith(p),
    )
    return joined.filter(~disallowed).drop("_rhost", "disallow_prefixes")


def apply_crawl_delay(
    tasks: DataFrame, robots: DataFrame, host_col: str = "hostname",
    slot_col: str = "slot", out: str = "planned_offset_ms",
) -> DataFrame:
    """Politeness pacing: the k-th same-host task in a wave is planned
    at (k-1) * crawl_delay_ms. Hosts without a rule get 0 (reference
    parity: no delay semantics exist in TSpider's scheduler; its
    pacing came from rendering latency)."""
    r = F.broadcast(robots.select(F.col("host").alias("_rhost"), "crawl_delay_ms"))
    joined = tasks.join(r, F.col(host_col) == F.col("_rhost"), "left")
    delay = F.coalesce(F.col("crawl_delay_ms"), F.lit(0))
    return joined.withColumn(
        out, ((F.col(slot_col) - 1) * delay).cast("long")
    ).drop("_rhost", "crawl_delay_ms")
