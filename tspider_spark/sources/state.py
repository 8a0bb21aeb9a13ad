"""Transactional crawl-state store: partitioned parquet + an atomic
JSON manifest (an Iceberg-shaped snapshot log; FIXTURES.md §A5).

The reference keeps all crawl state in Redis hashes/lists
(settings.py:26-41) mutated record-at-a-time. Here every wave commits
one atomic snapshot: each table's new rows are written as a new
immutable parquet directory, then a single manifest file is replaced
via ``os.replace`` (atomic on POSIX). A killed job therefore resumes
from the last committed wave exactly (north_rule); a partially
written wave leaves orphan files but never a visible half-commit.

Append-only tables (frontier, seen sets, results, metrics) accumulate
file lists across versions — no rewrite, like Iceberg manifests.
Replace tables (host_budget, whitelist, crawl_state meta) point at
their latest version only.

On a real deployment this maps 1:1 onto Iceberg ``append``/
``overwrite`` snapshot commits; parquet+manifest is the offline
stand-in (no Iceberg runtime jar in this environment).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SCHEMAS = {
    "frontier": T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("hostname", T.StringType()),
            T.StructField("depth", T.IntegerType()),
            T.StructField("discovery_order", T.LongType()),
            T.StructField("slot", T.IntegerType()),  # politeness slot per host
            T.StructField("planned_offset_ms", T.LongType()),  # robots pacing
        ]
    ),
    # hostname is persisted alongside the key so the F8 anti-join can be
    # host-co-partitioned with the admission fold (one shuffle per wave)
    "seen_scanned": T.StructType(
        [
            T.StructField("hostname", T.StringType()),
            T.StructField("scan_key", T.StringType()),
        ]
    ),
    "seen_saved": T.StructType([T.StructField("saved_key", T.StringType())]),
    "host_budget": T.StructType(
        [
            T.StructField("hostname", T.StringType()),
            T.StructField("reqcount", T.LongType()),
        ]
    ),
    "whitelist": T.StructType([T.StructField("scope_key", T.StringType())]),
    "results": T.StructType(
        [
            T.StructField("method", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("postdata", T.StringType()),
            T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
            T.StructField("type", T.StringType()),
            T.StructField("pattern", T.StringType()),
            T.StructField("hostname", T.StringType()),
            T.StructField("domain", T.StringType()),
            T.StructField("is_target", T.BooleanType()),
            T.StructField("wave", T.IntegerType()),
            T.StructField("save_order", T.LongType()),
        ]
    ),
    "fetch_metrics": T.StructType(
        [
            T.StructField("wave", T.IntegerType()),
            T.StructField("stage", T.StringType()),
            T.StructField("partition_id", T.IntegerType()),
            T.StructField("rows", T.LongType()),
        ]
    ),
}

APPEND_TABLES = ("frontier", "seen_scanned", "seen_saved", "results", "fetch_metrics")
REPLACE_TABLES = ("host_budget", "whitelist")


def empty_df(spark: SparkSession, schema: T.StructType) -> DataFrame:
    """Zero-partition empty DataFrame. ``spark.createDataFrame([], schema)``
    builds a ParallelCollectionRDD with default-parallelism python-backed
    partitions — every downstream stage then runs one python-worker task
    per core just to deserialize nothing (and blocks when the workers
    are busy with real UDF work)."""
    return spark.createDataFrame(spark.sparkContext.emptyRDD(), schema)


class StateStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- manifest -----------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"version": 0, "tables": {}, "meta": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict):
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    @property
    def version(self) -> int:
        return self.manifest()["version"]

    def meta(self) -> dict:
        return self.manifest()["meta"]

    # --- read ----------------------------------------------------------

    def read(self, table: str) -> DataFrame:
        dirs = self.manifest()["tables"].get(table, [])
        paths = [os.path.join(self.root, d) for d in dirs]
        if not paths:
            return empty_df(self.spark, SCHEMAS[table])
        return self.spark.read.schema(SCHEMAS[table]).parquet(*paths)

    # --- commit ----------------------------------------------------------

    def commit(
        self,
        appends: dict | None = None,
        replaces: dict | None = None,
        meta: dict | None = None,
    ) -> int:
        """Write all table updates, then atomically bump the manifest.
        ``appends[table]`` rows are added; ``replaces[table]`` replaces
        the table's full contents. Nothing is visible until the final
        manifest swap."""
        m = self.manifest()
        v = m["version"] + 1
        tables = {k: list(vv) for k, vv in m["tables"].items()}
        for table, df in (appends or {}).items():
            rel = os.path.join(table, f"v{v:06d}")
            df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
            tables.setdefault(table, []).append(rel)
        for table, df in (replaces or {}).items():
            rel = os.path.join(table, f"v{v:06d}")
            df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
            tables[table] = [rel]
        m["version"] = v
        m["tables"] = tables
        if meta:
            m["meta"].update(meta)
        self._write_manifest(m)
        return v

    def destroy(self):
        shutil.rmtree(self.root, ignore_errors=True)
        os.makedirs(self.root, exist_ok=True)
