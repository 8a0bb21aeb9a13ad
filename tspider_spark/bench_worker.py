"""Single-parallelism-level bench worker (one JVM per level — Spark
can't change master in-process; bench.py orchestrates two of these).

Workload: one full crawl-scheduling wave over a Spark-generated
synthetic frontier+documents pair —
  frontier tasks ⋈ documents (fetch) -> JVM span extraction ->
  pandas-UDF canonicalization -> stateless filters -> seen-set
  anti-join -> per-host admission fold (dedupe + budget windows).

The corpus is generated entirely with JVM expressions (spark.range +
transform/sequence) and written to parquet once, so the timed section
measures the scheduling pipeline, not Python generation. Hosts are
skewed (~20% of links hit 1% of hosts) to exercise the AQE/skew path.

Prints one JSON line:
  {"candidates": N, "admitted": M, "elapsed_sec": t, "cores": c}
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

from pyspark.sql import functions as F


def _letters(col):
    """Digit string -> letter string so every id yields a DISTINCT
    {digit}-pattern (pattern canonicalization T2 folds digits)."""
    return F.translate(col.cast("string"), "0123456789", "abcdefghij")


def _page_url(host_id, page_id, ext=None):
    parts = [
        F.lit("http://bhost"),
        host_id.cast("string"),
        F.lit(".com/p/"),
        _letters(page_id),
    ]
    if ext is not None:
        parts.append(ext)
    return F.concat(*parts)


def build_corpus(spark, n_docs: int, n_hosts: int, links_per_doc: int, path: str):
    hot = max(n_hosts // 100, 1)
    doc = spark.range(n_docs).select(
        _page_url(F.col("id") % n_hosts, F.col("id")).alias("doc_id"),
        F.col("id"),
    )
    # link targets: 20% to hot hosts, rest spread; ~25% duplicate
    # patterns via modulo folding; a sprinkle of blocked extensions
    j = F.explode(F.sequence(F.lit(0), F.lit(links_per_doc - 1))).alias("j")
    links = doc.select("doc_id", "id", j).select(
        "doc_id",
        "id",
        "j",
        (
            F.when((F.col("id") + F.col("j")) % 5 == 0,
                   (F.col("id") * 7 + F.col("j")) % hot)
            .otherwise((F.col("id") * 13 + F.col("j") * 31) % n_hosts)
        ).alias("th"),
        ((F.col("id") * 17 + F.col("j") * 101) % (n_docs * 4 // 3)).alias("tp"),
    ).select(
        "doc_id",
        "id",
        "j",
        _page_url(
            F.col("th"),
            F.col("tp"),
            F.when((F.col("id") + F.col("j")) % 17 == 0, ".jpg").otherwise(""),
        ).alias("target"),
    )
    spans = links.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.lit("link").alias("kind"),
                    F.col("target").alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.col("j").cast("int").alias("offset"),
                )
            )
        ).alias("spans")
    )
    spans.write.mode("overwrite").parquet(path)


def run(cores: int, n_docs: int, n_hosts: int, links: int, wave_frac: float,
        seen_frac: float, corpus_path: str | None, salt: int = 0) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from tspider_spark.functions.urlfuncs import with_url_info
    from tspider_spark.operators import filters as FL
    from tspider_spark.operators.dedupe import anti_join_seen_copart
    from tspider_spark.operators.extract import extract_candidates
    from tspider_spark.operators.schedule import admit_wave, admit_wave_salted
    from tspider_spark.session import get_spark, warm_python_workers

    # identical shuffle layout at both parallelism levels: the scaling
    # comparison must vary ONLY the core count. 256 (8x the hi core
    # count) measured ~10% faster than 128 at 32 cores — finer tasks
    # shrink the stage-tail idle that AQE can't rebalance mid-stage —
    # and is the regime a real cluster runs anyway (partitions >> cores)
    n_part = int(os.environ.get("TSPIDER_BENCH_SHUFFLE", "256"))
    spark = get_spark(f"bench-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=n_part)
    own_corpus = corpus_path is None
    if own_corpus:
        corpus_path = tempfile.mkdtemp(prefix="tspider_bench_") + "/docs"
    if not os.path.exists(corpus_path + "/_SUCCESS"):
        build_corpus(spark, n_docs, n_hosts, links, corpus_path)
    # measure the warm state (a real cluster's workers live for hours)
    warm_python_workers(spark, cores)

    docs = spark.read.parquet(corpus_path)
    # Bucketed documents (DEFAULT; TSPIDER_BENCH_BUCKETED=0 for the
    # plain-parquet layout): the 10^10-scale storage layout from the
    # north_star — documents bucketed+sorted by the join key, so the
    # fetch join's documents side satisfies its required partitioning
    # straight off storage and ONLY the frontier side exchanges
    # (tests/test_bucketed_fetch.py pins the plan shape). Interleaved
    # event-log A/B at 32 cores: 899.2 vs 1532.7 aggregate CPU-s
    # (−41%), wall 471.2k vs 284.9k URLs/s, identical admitted set.
    # The one-time bucketed write happens BEFORE the timed section (a
    # real deployment pays it at ingest, not per wave) and is shared
    # across workers/trials: the first worker writes, later sessions
    # re-register the existing files via CREATE TABLE ... CLUSTERED BY
    # ... LOCATION. Bucket count == shuffle width so the join's
    # partitioning lines up at both parallelism levels.
    if os.environ.get("TSPIDER_BENCH_BUCKETED", "1") != "0":
        tbl = f"bench_docs_b{n_part}"
        bpath = f"{corpus_path}_bucketed{n_part}"
        spark.sql(f"drop table if exists {tbl}")
        if os.path.exists(bpath + "/_SUCCESS"):
            spark.sql(
                f"create table {tbl} (doc_id string, spans "
                f"array<struct<kind:string,text:string,media_ref:string,"
                f"offset:int>>) using parquet "
                f"clustered by (doc_id) sorted by (doc_id) "
                f"into {n_part} buckets location '{bpath}'"
            )
        else:
            (
                docs.write.bucketBy(n_part, "doc_id")
                .sortBy("doc_id")
                .option("path", bpath)
                .format("parquet")
                .mode("overwrite")
                .saveAsTable(tbl)
            )
        docs = spark.table(tbl)
    n_tasks = int(n_docs * wave_frac)
    tasks = spark.range(n_tasks).select(
        _page_url(F.col("id") % n_hosts, F.col("id")).alias("task_url"),
        F.lit(0).alias("depth"),
        F.col("id").alias("task_rank"),
    )
    # pre-seen set: a deterministic slice of the target key space,
    # carrying hostname for the co-partitioned anti-join (the engine's
    # seen_scanned table persists hostname for the same reason)
    seen = spark.range(int(n_docs * seen_frac)).select(
        F.concat(F.lit("bhost"), ((F.col("id") * 13) % n_hosts).cast("string"),
                 F.lit(".com")).alias("hostname"),
        F.concat(
            F.lit("bhost"),
            ((F.col("id") * 13) % n_hosts).cast("string"),
            F.lit(".com//p/"),
            _letters((F.col("id") * 29) % (n_docs * 4 // 3)),
        ).alias("scan_key"),
    ).distinct()
    # Bucketed SEEN layout (DEFAULT since r5, the engine's own
    # steady state — StateStore.compact rewrites seen_scanned this
    # way every compact_every waves; TSPIDER_BENCH_SEEN_BUCKETED=0
    # for the plain layout): persist the seen set bucketed by
    # (hostname, scan_key) — the exact join keys of the anti-join —
    # with bucket count == shuffle width: the documents fetch-join
    # trick applied to accumulated state, so in the big-seen
    # (sort-merge) regime the seen scan satisfies the join's required
    # distribution off storage and only the wave's candidates
    # exchange (event-log A/B at 4M keys: Σ task CPU −18%, seen
    # exchange+sort gone; see BASELINE.md round 5). One-time write
    # outside the timed section (a real deployment pays it at
    # state-compaction time); shared across workers via
    # re-registration, like the documents table.
    seen_bucketed = os.environ.get("TSPIDER_BENCH_SEEN_BUCKETED", "1") != "0"
    if seen_bucketed:
        # the seen-set size is baked into the shared dir/table name so
        # a corpus dir reused under a different --seen-frac can never
        # silently re-register a stale persisted seen set
        n_seen_keys = int(n_docs * seen_frac)
        stbl = f"bench_seen_b{n_part}_{n_seen_keys}"
        spath = f"{corpus_path}_seen{n_seen_keys}_bucketed{n_part}"
        spark.sql(f"drop table if exists {stbl}")
        if os.path.exists(spath + "/_SUCCESS"):
            spark.sql(
                f"create table {stbl} (hostname string, scan_key string) "
                f"using parquet clustered by (hostname, scan_key) "
                f"sorted by (hostname, scan_key) into {n_part} buckets "
                f"location '{spath}'"
            )
        else:
            (
                seen.write.bucketBy(n_part, "hostname", "scan_key")
                .sortBy("hostname", "scan_key")
                .option("path", spath)
                .format("parquet")
                .mode("overwrite")
                .saveAsTable(stbl)
            )
        seen = spark.table(stbl)
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from tspider_spark.sources.state import empty_df

    budget = empty_df(spark, StructType([
        StructField("hostname", StringType()),
        StructField("reqcount", LongType()),
    ]))

    # The timed wave runs the engine's two-shuffle plan: one exchange on
    # task_url (extraction windows), one on hostname (co-partitioned
    # seen anti-join + the whole admission fold).
    t0 = time.time()
    # shuffle-hash fetch join (NOT broadcast): a frontier wave is
    # millions of rows — a broadcast would build the hash relation
    # single-threaded on the driver, an identical serial cost at every
    # cluster size. The join's own task_url exchange then feeds the
    # extraction windows directly (no further exchange).
    fetched = tasks.hint("shuffle_hash").join(
        docs, F.col("task_url") == F.col("doc_id"), "inner")
    # narrow to the scheduling stream's columns BEFORE caching — the
    # cache is read twice (hybrid fast/slow branches); headers maps and
    # postdata would double the cached bytes for nothing. The cached
    # _fe flag makes each branch filter a boolean read instead of a
    # second regex pass over 24M urls.
    from tspider_spark.functions.urlfuncs import fast_eligible

    cands = (
        extract_candidates(fetched, partitions=0)
        .select("url", "task_rank", "seq")
        .withColumn("_fe", fast_eligible(F.col("url")))
    )
    cands.persist()
    if os.environ.get("TSPIDER_BENCH_BARRIER"):
        cands.count()  # optional mid-pipeline materialization barrier

    stream = (
        with_url_info(cands, "url", eligible_col="_fe")
        .filter(F.col("u.valid") & FL.stateless_valid([]))
        .select(
            F.col("u.hostname").alias("hostname"),
            F.col("u.scan_key").alias("scan_key"),
            F.col("u.url").alias("url"),
            "task_rank", "seq",
            F.lit(1).alias("synth_rank"),
        )
    )
    # slim fold (engine cfg.slim_fold): the hostname exchange + both
    # window sorts carry only the fold's working set; the canonical
    # url is re-attached AFTER admission by broadcast-probing the
    # cap-bounded admitted key-set against the cached raw candidates.
    # DEFAULT OFF, matching CrawlConfig.slim_fold — event-log A/B at
    # 32 cores measured 1.9x aggregate CPU (3414 vs 1796 CPU-s) for
    # the slim path on in-memory shuffle: the payload-recovery rescan
    # + broadcast outweighs the shuffled-bytes saving. Opt in with
    # TSPIDER_BENCH_SLIM=1 for network-shuffle regimes.
    slim = os.environ.get("TSPIDER_BENCH_SLIM", "0") != "0"
    fold_in = stream.drop("url") if slim else stream
    if salt:
        # skew path: (host, bucket) exchange shared by anti-join + fold
        fold_in = anti_join_seen_copart(
            fold_in, seen, "scan_key", "hostname", n_part, salt_buckets=salt)
        admitted = admit_wave_salted(
            fold_in, budget, 100, salt, n_part, bucket_col="_salt_b")
    elif os.environ.get("TSPIDER_BENCH_HOSTCODES", "0") != "0":
        # dictionary-coded host exchange (r3 verdict item 7 A/B): the
        # anti-join + every fold window key on xxhash64(hostname)
        # first (hostname kept as a tie key — exact), so the window
        # sorts compare an 8-byte long instead of the host string.
        fold_in = anti_join_seen_copart(
            fold_in, seen, "scan_key", "hostname", n_part, code_col="_hc")
        admitted = admit_wave(
            fold_in, budget, max_per_host=100, reduce_first=False,
            code_col="_hc")
    else:
        fold_in = anti_join_seen_copart(
            fold_in, seen, "scan_key", "hostname", n_part)
        # no explicit repartition: the fold windows' ENSURE exchange
        # sets the host partitioning (AQE-coalescible, unlike an
        # explicit REPARTITION_BY_NUM)
        admitted = admit_wave(fold_in, budget, max_per_host=100, reduce_first=False)
    if slim:
        payload = cands.join(
            F.broadcast(admitted), ["task_rank", "seq"]
        )
        admitted = with_url_info(payload, "url", eligible_col="_fe").select(
            F.col("u.url").alias("url"), "hostname", "scan_key",
            "task_rank", "seq", "synth_rank",
        )
    # ONE action drives the whole wave (extraction cache fills on the
    # way) — no mid-pipeline count barrier idling the cluster.
    # TSPIDER_BENCH_DIGEST=1 swaps the count action for a 1-row agg
    # that ALSO folds the admitted rows into two parallelism-invariant
    # checksums — the north rule's cross-cluster-size parity evidence:
    #   set_digest   = bit_xor over md5(hostname|scan_key)      — the
    #                  admitted URL-seen key set, order-insensitive
    #   order_digest = bit_xor over md5(key|task_rank|seq)      — the
    #                  (url -> priority position) mapping; equal
    #                  digests at N and 4N cores mean the SAME urls in
    #                  the SAME crawl order, not just equal counts
    digest = os.environ.get("TSPIDER_BENCH_DIGEST", "0") != "0"
    if digest:
        def _h(*cols):
            return F.conv(
                F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10
            ).cast("long")

        row = (
            admitted.select(
                _h("hostname", "scan_key").alias("_sh"),
                _h(
                    "hostname",
                    "scan_key",
                    F.col("task_rank").cast("string"),
                    F.col("seq").cast("string"),
                ).alias("_oh"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(_sh)").alias("sd"),
                F.expr("bit_xor(_oh)").alias("od"),
            )
            .first()
        )
        n_admit = row["n"]
    else:
        n_admit = admitted.count()
    elapsed = time.time() - t0
    n_cands = cands.count()  # post-hoc, reads the cache
    cands.unpersist()

    out = {
        "cores": cores,
        "candidates": n_cands,
        "admitted": n_admit,
        "elapsed_sec": round(elapsed, 3),
        "urls_per_sec": round(n_cands / elapsed, 1),
    }
    if digest:
        out["set_digest"] = row["sd"]
        out["order_digest"] = row["od"]
    spark.stop()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--n-docs", type=int, default=int(os.environ.get("TSPIDER_BENCH_DOCS", 4000000)))
    ap.add_argument("--n-hosts", type=int, default=4000)
    ap.add_argument("--links", type=int, default=12)
    ap.add_argument("--wave-frac", type=float, default=0.5)
    ap.add_argument("--seen-frac", type=float, default=0.25)
    ap.add_argument("--corpus-path", default=None)
    ap.add_argument("--salt", type=int,
                    default=int(os.environ.get("TSPIDER_BENCH_SALT", "0")))
    args = ap.parse_args()
    res = run(args.cores, args.n_docs, args.n_hosts, args.links,
              args.wave_frac, args.seen_frac, args.corpus_path, args.salt)
    print("BENCH_RESULT " + json.dumps(res))


if __name__ == "__main__":
    main()
