"""Bucketed accumulated-seen layout (r4 verdict item 3 / BASELINE
handoff #5): compaction rewrites seen_scanned CLUSTERED+SORTED BY
(hostname, scan_key) — the F8 anti-join's exact keys — and the wave
verifies against (bucketed base, appended delta) instead of the union
scan. Pins:

(a) store: read_split's base∪delta equals read() row-for-row; a
    replace (unblock) drops the bucketed record; re-compaction
    refreshes it.
(b) plan: the exact anti-join over the bucketed base adds ONE
    exchange, on the candidate side — the accumulated seen state is
    never exchanged (EnsureRequirements is satisfied by the scan).
(c) engine: crawls with compact_every set (default and cuckoo modes)
    produce byte-identical crawl order vs the reference oracle — the
    smoke for chained base+delta anti-joins being equal to the union
    anti-join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tspider_spark.config import CrawlConfig
from tspider_spark.operators.dedupe import anti_join_seen_copart
from tspider_spark.plans.crawl import CrawlEngine
from tspider_spark.plans.oracle import ReferenceOracle
from tspider_spark.sources.corpus import (
    CorpusSpec,
    corpus_to_spark,
    generate_corpus,
)
from tspider_spark.sources.state import StateStore


def _seen(spark, n, salt=""):
    return spark.range(n).select(
        F.concat(
            F.lit("h"), (F.col("id") % 7).cast("string"), F.lit(".com")
        ).alias("hostname"),
        F.concat(
            F.lit("h"), (F.col("id") % 7).cast("string"),
            F.lit(".com//p/"), F.col("id").cast("string"), F.lit(salt),
        ).alias("scan_key"),
    )


def test_read_split_parity_and_replace_invalidation(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "st"))
    store.commit(appends={"seen_scanned": _seen(spark, 300)})
    store.commit(appends={"seen_scanned": _seen(spark, 200, "x")})

    # pre-compaction: no bucketed base
    base, delta = store.read_split("seen_scanned")
    assert base is None
    assert delta.count() == 500

    store.compact(partitions=4)
    base, delta = store.read_split("seen_scanned")
    assert base is not None and delta is None
    assert base.count() == 500

    # append after compaction -> base + delta, union == read()
    store.commit(appends={"seen_scanned": _seen(spark, 100, "y")})
    base, delta = store.read_split("seen_scanned")
    assert base is not None and delta is not None
    got = sorted(
        (r["hostname"], r["scan_key"])
        for r in base.unionByName(delta).collect()
    )
    exp = sorted(
        (r["hostname"], r["scan_key"])
        for r in store.read("seen_scanned").collect()
    )
    assert got == exp and len(got) == 600

    # a replace supersedes the bucketed snapshot
    store.commit(replaces={"seen_scanned": _seen(spark, 50, "z")})
    base, delta = store.read_split("seen_scanned")
    assert base is None and delta.count() == 50

    # re-compaction after fresh appends restores the bucketed base
    store.commit(appends={"seen_scanned": _seen(spark, 30, "w")})
    store.compact(partitions=4)
    base, delta = store.read_split("seen_scanned")
    assert base is not None and delta is None and base.count() == 80
    rec = store.manifest()["bucketed"]["seen_scanned"]
    assert rec["keys"] == ["hostname", "scan_key"]
    assert rec["buckets"] == 4


def test_bucketed_base_anti_join_never_exchanges_seen(spark, tmp_path):
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        store = StateStore(spark, str(tmp_path / "st"))
        store.commit(appends={"seen_scanned": _seen(spark, 400)})
        store.commit(appends={"seen_scanned": _seen(spark, 100, "x")})
        store.compact(partitions=4)
        base, delta = store.read_split("seen_scanned")
        assert delta is None

        cands = _seen(spark, 900, "c").withColumn(
            "task_rank", F.monotonically_increasing_id()
        )
        j = anti_join_seen_copart(cands, base, "scan_key", "hostname", 4)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        # the one exchange hangs over the candidate side: it appears
        # BEFORE the bucketed seen scan in the plan dump
        assert plan.rindex("Exchange") < plan.index("tspider_state_b"), plan

        # foil: the same join against the plain union scan exchanges
        # BOTH sides
        plain = spark.createDataFrame(base.collect(), base.schema)
        n_plain = (
            anti_join_seen_copart(cands, plain, "scan_key", "hostname", 4)
            ._jdf.queryExecution().executedPlan().toString().count("Exchange")
        )
        assert n_plain == 2
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_bucketed_saved_anti_join_never_exchanges_saved(spark, tmp_path):
    """The saved-set dedupe (F12) gets the same storage-partitioned
    shape: seen_saved bucket-compacts on saved_key, and the wave's
    left-anti join reads it exchange-free."""
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        store = StateStore(spark, str(tmp_path / "st"))
        sv = spark.range(300).select(
            F.concat(F.lit("GET-p"), F.col("id").cast("string")).alias(
                "saved_key"
            )
        )
        store.commit(appends={"seen_saved": sv})
        store.commit(
            appends={
                "seen_saved": sv.select(
                    F.concat(F.col("saved_key"), F.lit("x")).alias(
                        "saved_key"
                    )
                )
            }
        )
        store.compact(partitions=4)
        base, delta = store.read_split("seen_saved")
        assert base is not None and delta is None
        cands = spark.range(900).select(
            F.concat(F.lit("GET-p"), (F.col("id") * 2).cast("string")).alias(
                "saved_key"
            ),
            F.col("id").alias("task_rank"),
        )
        j = cands.join(base, "saved_key", "left_anti")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert plan.rindex("Exchange") < plan.index("tspider_state_b"), plan
        exp = cands.join(
            store.read("seen_saved"), "saved_key", "left_anti"
        ).count()
        assert j.count() == exp
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize(
    "cfg_kwargs",
    [
        {"compact_every": 1},
        {"compact_every": 1, "cuckoo_filter": True},
        {
            "compact_every": 2,
            "cuckoo_filter": True,
            "cuckoo_probe": "broadcast",
        },
    ],
    ids=["exact", "cuckoo-copart", "cuckoo-broadcast"],
)
def test_engine_crawl_with_bucketed_compaction_matches_oracle(
    spark, tmp_path, cfg_kwargs
):
    docs, seeds = generate_corpus(
        CorpusSpec(seed=11, n_domains=4, hosts_per_domain=2, hot_host_pages=25)
    )
    cfg = CrawlConfig(tld=True, max_per_host=6, **cfg_kwargs)
    oracle = ReferenceOracle(docs, cfg).run(seeds)
    eng = CrawlEngine(
        spark, corpus_to_spark(spark, docs), str(tmp_path / "state"), cfg
    )
    eng.seed(seeds)
    eng.run()
    got = [
        (r["url"], r["depth"], r["rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    # the run compacted at least once, so the final state is bucketed
    assert eng.store.manifest().get("bucketed", {}).get("seen_scanned")
