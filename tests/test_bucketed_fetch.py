"""Storage-partitioned fetch join (north_rule 10^10-scale shape):
with the documents table bucketed by the join key (doc_id), the fetch
join must shuffle ONLY the frontier side — the big documents scan
satisfies the join's required partitioning straight off storage. Two
pins: (a) the physical plan has exactly one Exchange, on the task
side; (b) the engine's crawl output over the bucketed table is
byte-identical to the ordinary-parquet run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tspider_spark.config import CrawlConfig
from tspider_spark.plans.crawl import CrawlEngine
from tspider_spark.plans.oracle import ReferenceOracle
from tspider_spark.sources.corpus import (
    CorpusSpec,
    corpus_to_spark,
    generate_corpus,
    write_bucketed_documents,
)

TABLE = "tspider_test_docs_bucketed"


@pytest.fixture()
def bucketed_docs(spark):
    spark.sql(f"drop table if exists {TABLE}")  # rerun-safety
    docs, seeds = generate_corpus(
        CorpusSpec(seed=7, n_domains=3, hosts_per_domain=2, hot_host_pages=20)
    )
    bucketed = write_bucketed_documents(
        spark, corpus_to_spark(spark, docs), TABLE, buckets=8
    )
    yield docs, seeds, bucketed
    spark.sql(f"drop table if exists {TABLE}")


def _n_exchanges(df) -> tuple[int, str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange"), plan


def test_bucketed_join_shuffles_only_the_task_side(spark, bucketed_docs):
    _, _, bucketed = bucketed_docs
    # pin the join strategy: no broadcast (at real scale neither side
    # broadcasts), no AQE plan rewrite hiding the static exchanges
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
        # bucketed-side reuse requires the shuffle width to match the
        # bucket count (a real deployment sizes buckets >= parallelism)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        tasks = spark.createDataFrame(
            [(f"http://h{i}.example.com/p{i}", i) for i in range(50)],
            "task_url string, task_rank long",
        )
        j = tasks.join(bucketed, F.col("task_url") == F.col("doc_id"))
        n, plan = _n_exchanges(j)
        assert n == 1, f"documents side must not shuffle:\n{plan}"
        # the one exchange hangs over the task side, not the scan
        doc_scan = plan.index(TABLE)
        assert plan.rindex("Exchange") < doc_scan, plan

        # foil: the same join over plain (unbucketed) parquet shuffles
        # BOTH sides
        plain = bucketed.sparkSession.createDataFrame(
            bucketed.collect(), bucketed.schema
        )
        n_plain, _ = _n_exchanges(
            tasks.join(plain, F.col("task_url") == F.col("doc_id"))
        )
        assert n_plain == 2
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_bucketed_documents_crawl_matches_oracle(spark, tmp_path, bucketed_docs):
    docs, seeds, bucketed = bucketed_docs
    cfg = CrawlConfig(tld=True, max_per_host=5)
    oracle = ReferenceOracle(docs, cfg).run(seeds)
    engine = CrawlEngine(spark, bucketed, str(tmp_path / "state"), cfg)
    engine.seed(seeds)
    engine.run()
    got = [
        (r["url"], r["depth"], r["rank"])
        for r in engine.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
