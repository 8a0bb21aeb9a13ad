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
            # registered domain, persisted so the consumer-side
            # blocklist re-check (F10 on the CURRENT blocklist) is a
            # pure string suffix-walk — no URL re-derivation / PSL
            # lookup on the wave's critical path. NULL on stores
            # committed before this column existed; the re-check then
            # falls back to the conservative all-suffixes walk.
            T.StructField("domain", T.StringType()),
            T.StructField("depth", T.IntegerType()),
            T.StructField("discovery_order", T.LongType()),
            T.StructField("slot", T.IntegerType()),  # politeness slot per host
            T.StructField("planned_offset_ms", T.LongType()),  # robots pacing
            # auth/cookie fetch context (reference --cookie-file,
            # tspider.py:32): opaque per-seed context id inherited by
            # child tasks, honored by the fetch join. Old stores read
            # it as NULL == the default context "".
            T.StructField("fetch_context", T.StringType()),
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
    # persistent cuckoo seen-filter shards (CrawlConfig.cuckoo_filter):
    # maintained per-wave from the admitted delta, deletable on
    # blocklist removal (operators/dedupe.py apply_cuckoo_delta)
    "seen_filter": T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("tbl", T.BinaryType()),
            T.StructField("n_buckets", T.LongType()),
        ]
    ),
}

# frontier tasks dropped by the consumer-side blocklist re-check,
# recorded so CrawlEngine.remove_blocklist can forget + re-admit them
# (the reference's Redis seen set loses these URLs forever)
SCHEMAS["blocked_tasks"] = SCHEMAS["frontier"]

# per-host candidate-pattern pressure for trap detection
# (CrawlConfig.trap_min_urls): n_urls = candidate occurrences seen,
# n_patterns = Σ per-wave distinct scan_keys (an upper bound on the
# global distinct — a pattern recurring across waves recounts; the
# trap thresholds are heuristics and the bound only errs toward
# flagging hosts that keep re-minting patterns, which is the signal)
SCHEMAS["host_pattern_stats"] = T.StructType(
    [
        T.StructField("hostname", T.StringType()),
        T.StructField("n_urls", T.LongType()),
        T.StructField("n_patterns", T.LongType()),
    ]
)

# continuous-ingestion dedupe state (streaming/stream.py
# run_foreach_batch_incremental_dedupe): the corpus-so-far and its
# persisted MinHash band index — each micro-batch dedupes against the
# index (wave-proportional work) and appends only its survivors
SCHEMAS["dedup_docs"] = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)
SCHEMAS["band_index"] = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.StringType()),
    ]
)

# streaming sketch maintenance (stream.py run_foreach_batch_sketch_merge):
# per-host HLL register table max-merged across micro-batches — the
# store-sketches-not-numbers pattern; ≤ 2^b rows per host forever
SCHEMAS["host_hll"] = T.StructType(
    [
        T.StructField("hostname", T.StringType()),
        T.StructField("reg", T.IntegerType()),
        T.StructField("rho", T.IntegerType()),
    ]
)

SCHEMAS["cms_state"] = T.StructType(
    [
        T.StructField("row", T.IntegerType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
    ]
)

APPEND_TABLES = (
    "frontier", "seen_scanned", "seen_saved", "results", "fetch_metrics",
    "blocked_tasks", "dedup_docs", "band_index",
)
REPLACE_TABLES = ("host_budget", "whitelist", "seen_filter",
                  "host_pattern_stats", "host_hll", "cms_state")


class ConcurrentCommitError(RuntimeError):
    """Another writer committed a snapshot between this commit's base
    read and its manifest swap (Iceberg: CommitFailedException). The
    store is unchanged by the failed commit — only orphan data files
    were written; callers re-read state and retry."""


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
        # Iceberg-analog snapshot log: every commit ALSO writes an
        # immutable manifest-v{N}.json; manifest.json stays the atomic
        # current pointer. Time travel = loading an old snapshot's
        # manifest (read(table, version=N)). Compaction deletes data
        # dirs it superseded, which expires the snapshots referencing
        # them — Iceberg's expire_snapshots semantics.
        snap = os.path.join(self.root, f"manifest-v{m['version']:06d}.json")
        with open(snap + ".tmp", "w") as f:
            json.dump(m, f, indent=1)
        os.replace(snap + ".tmp", snap)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    def snapshots(self) -> list:
        """Available snapshot versions, ascending (Iceberg: snapshot
        log). Versions whose data a later compaction removed may no
        longer be readable."""
        import re

        out = []
        for name in os.listdir(self.root):
            mm = re.fullmatch(r"manifest-v(\d{6})\.json", name)
            if mm:
                out.append(int(mm.group(1)))
        return sorted(out)

    @property
    def version(self) -> int:
        return self.manifest()["version"]

    def meta(self) -> dict:
        return self.manifest()["meta"]

    # --- read ----------------------------------------------------------

    def read(self, table: str, version: int | None = None) -> DataFrame:
        """Current state of ``table``; with ``version`` the state as of
        that committed snapshot (Iceberg ``VERSION AS OF``)."""
        if version is None:
            m = self.manifest()
        else:
            snap = os.path.join(self.root, f"manifest-v{version:06d}.json")
            if not os.path.exists(snap):
                raise ValueError(
                    f"snapshot v{version} not found (never committed, "
                    f"pre-snapshot-log store, or expired by compaction)"
                )
            with open(snap) as f:
                m = json.load(f)
        dirs = m["tables"].get(table, [])
        paths = [os.path.join(self.root, d) for d in dirs]
        if not paths:
            return empty_df(self.spark, SCHEMAS[table])
        df = self.spark.read.schema(SCHEMAS[table]).parquet(*paths)
        if table == "seen_scanned":
            # schema migration: stores committed before seen_scanned
            # gained the hostname column read it as all-NULL, and the
            # host-co-partitioned anti-join would then never match —
            # silently re-admitting every previously-seen URL on
            # resume. Backfill from the key itself: scan_key is
            # '<netloc>/<pattern-path>', so hostname = netloc minus
            # any port, lowercased (same derivation as urlfuncs).
            from pyspark.sql import functions as F

            df = df.withColumn(
                "hostname",
                F.coalesce(
                    F.col("hostname"),
                    F.lower(
                        F.regexp_replace(
                            F.substring_index("scan_key", "/", 1), ":[0-9]*$", ""
                        )
                    ),
                ),
            )
        return df

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
        bucketed = dict(m.get("bucketed", {}))
        writes = []
        for table, df in (appends or {}).items():
            rel = os.path.join(table, f"v{v:06d}")
            writes.append((df, rel))
            tables.setdefault(table, []).append(rel)
        for table, df in (replaces or {}).items():
            rel = os.path.join(table, f"v{v:06d}")
            writes.append((df, rel))
            tables[table] = [rel]
            # a replace supersedes any bucketed snapshot of the table
            bucketed.pop(table, None)
        if len(writes) > 1:
            # overlap the per-table write jobs (Spark schedules jobs
            # from concurrent driver threads FIFO across the pool):
            # a wave's 6 small sink jobs pipeline instead of paying 6
            # sequential job-scheduling latencies. Nothing is visible
            # until the manifest swap below, so partial failure still
            # leaves only orphan files.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(4, len(writes))) as ex:
                list(
                    ex.map(
                        lambda wd: wd[0]
                        .write.mode("overwrite")
                        .parquet(os.path.join(self.root, wd[1])),
                        writes,
                    )
                )
        elif writes:
            df, rel = writes[0]
            df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
        # Iceberg-analog optimistic concurrency: the commit was built
        # against manifest version v-1; if another writer swapped the
        # manifest while our table files were being written, refuse
        # rather than silently clobbering their commit (our files are
        # only orphans at this point — nothing is corrupted). A true
        # CAS needs a locking catalog (Iceberg: the catalog's atomic
        # swap); this detects every non-simultaneous conflict.
        cur = self.manifest()["version"]
        if cur != v - 1:
            raise ConcurrentCommitError(
                f"store advanced to v{cur} while committing v{v} "
                f"(built against v{v - 1}); re-read state and retry"
            )
        m["version"] = v
        m["tables"] = tables
        m["bucketed"] = bucketed
        if meta:
            m["meta"].update(meta)
        self._write_manifest(m)
        return v

    # --- maintenance ---------------------------------------------------

    # layout keys per table: compaction rewrites hash-clustered on
    # these so post-compaction scans feeding the host-co-partitioned
    # joins read host-clustered files (Iceberg: rewrite_data_files
    # with a cluster-by; here: repartition before the rewrite)
    COMPACT_LAYOUT = {
        "seen_scanned": ("hostname",),
        "frontier": ("hostname",),
        "seen_saved": ("saved_key",),
    }

    # tables whose compaction rewrite is BUCKETED on its join keys
    # (r4 verdict item 3 / BASELINE handoff #5): seen_scanned's
    # snapshot is written CLUSTERED+SORTED BY (hostname, scan_key) —
    # the exact keys of the F8 anti-join — so the post-compaction
    # wave plan reads a scan whose partitioning already satisfies the
    # join and the ACCUMULATED seen table is never exchanged again;
    # only the wave's candidates and the (small) post-compaction
    # append delta move. This was the one remaining O(accumulated-
    # state) exchange per wave (seen20m rows doubled where the cuckoo
    # probe stayed flat). On a real deployment this is the Iceberg
    # table's bucket(N, ...) partition transform applied at
    # rewrite_data_files time (storage-partitioned join).
    # seen_saved gets the same treatment: the wave's saved-set dedupe
    # (F12) left-anti-joins every candidate against the accumulated
    # saved keys — the other per-wave O(state) exchange. Bucketed on
    # saved_key (the join AND window key, at shuffle width), the join
    # is satisfied off storage and its candidate-side exchange is the
    # same hash partitioning the keep-first window needs.
    BUCKET_LAYOUT = {
        "seen_scanned": ("hostname", "scan_key"),
        "seen_saved": ("saved_key",),
    }

    def _bucket_table_name(self, rel: str) -> str:
        import hashlib

        h = hashlib.md5(
            os.path.abspath(os.path.join(self.root, rel)).encode()
        ).hexdigest()[:12]
        return f"tspider_state_b{h}"

    def _register_bucketed(self, table: str, rec: dict) -> DataFrame:
        """Catalog-register (idempotently) an existing bucketed
        snapshot dir and return its bucketed scan. The files are
        immutable (written once at compaction), so CREATE ... IF NOT
        EXISTS over the LOCATION is safe across sessions/engines."""
        name = self._bucket_table_name(rec["dir"])
        ddl_cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in SCHEMAS[table].fields
        )
        keys = ", ".join(rec["keys"])
        self.spark.sql(
            f"create table if not exists {name} ({ddl_cols}) "
            f"using parquet clustered by ({keys}) sorted by ({keys}) "
            f"into {rec['buckets']} buckets "
            f"location '{os.path.join(self.root, rec['dir'])}'"
        )
        return self.spark.table(name)

    def read_split(self, table: str):
        """(bucketed_base, delta) view of an append-only table:
        ``base`` is the bucketed compaction snapshot's scan (None if
        the table has never been bucket-compacted, or a replace
        superseded it), ``delta`` the union of the version dirs
        appended since (None when empty). ``base ∪ delta`` equals
        ``read(table)`` row-for-row; the split exists so the wave's
        anti-join can run exchange-free against the accumulated state
        and the planner can broadcast the small delta."""
        m = self.manifest()
        rec = m.get("bucketed", {}).get(table)
        dirs = m["tables"].get(table, [])
        if not rec or not dirs or dirs[0] != rec["dir"]:
            return None, self.read(table)
        base = self._register_bucketed(table, rec)
        rest = dirs[1:]
        if not rest:
            return base, None
        delta = self.spark.read.schema(SCHEMAS[table]).parquet(
            *[os.path.join(self.root, d) for d in rest]
        )
        return base, delta

    def compact(
        self,
        tables: list | None = None,
        partitions: int = 32,
        bucket: bool = True,
    ) -> list:
        """Rewrite each append-only table's accumulated version dirs
        into ONE new snapshot dir, then atomically repoint the
        manifest. A 1000-wave crawl otherwise reads 1000 parquet dirs
        per seen_scanned scan; after compaction it reads one. Contents
        are bit-identical (tests pin this); old dirs are removed after
        the manifest swap (crash between swap and cleanup leaves only
        orphan files, never a broken table).

        ``bucket`` (default): tables in BUCKET_LAYOUT are rewritten
        CLUSTERED+SORTED BY their join keys into ``partitions``
        buckets and recorded in the manifest, so read_split() can hand
        the wave an exchange-free base scan."""
        m = self.manifest()
        todo = [
            t
            for t in (tables or APPEND_TABLES)
            if len(m["tables"].get(t, [])) > 1
        ]
        bucketed = dict(m.get("bucketed", {}))
        compacted = []
        v = m["version"] + 1
        old_dirs = []
        for table in todo:
            df = self.read(table)
            rel = os.path.join(table, f"v{v:06d}c")
            bkeys = self.BUCKET_LAYOUT.get(table) if bucket else None
            if bkeys:
                # one file per bucket: cluster rows into their bucket
                # before the bucketed write
                name = self._bucket_table_name(rel)
                self.spark.sql(f"drop table if exists {name}")
                (
                    df.repartition(partitions, *bkeys)
                    .write.bucketBy(partitions, *bkeys)
                    .sortBy(*bkeys)
                    .option("path", os.path.join(self.root, rel))
                    .format("parquet")
                    .mode("overwrite")
                    .saveAsTable(name)
                )
                bucketed[table] = {
                    "dir": rel,
                    "buckets": partitions,
                    "keys": list(bkeys),
                }
            else:
                keys = self.COMPACT_LAYOUT.get(table)
                if keys:
                    df = df.repartition(partitions, *keys)
                df.write.mode("overwrite").parquet(
                    os.path.join(self.root, rel)
                )
                bucketed.pop(table, None)
            old_dirs.extend(m["tables"][table])
            m["tables"][table] = [rel]
            compacted.append(table)
        if not compacted:
            return []
        # same optimistic-concurrency gate as commit(): compaction
        # swaps a manifest built from its base read, so a concurrent
        # commit landing mid-rewrite would be silently lost without it
        cur = self.manifest()["version"]
        if cur != v - 1:
            raise ConcurrentCommitError(
                f"store advanced to v{cur} while compacting to v{v} "
                f"(built against v{v - 1}); re-read state and retry"
            )
        m["version"] = v
        m["bucketed"] = bucketed
        self._write_manifest(m)
        for rel in old_dirs:
            # a superseded bucketed snapshot may be catalog-registered
            # under its dir-derived name; unregister before deleting
            self.spark.sql(
                f"drop table if exists {self._bucket_table_name(rel)}"
            )
            shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
        return compacted

    def destroy(self):
        shutil.rmtree(self.root, ignore_errors=True)
        os.makedirs(self.root, exist_ok=True)
