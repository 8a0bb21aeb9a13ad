"""K3-K6 exports, S6 rebuild, T9 header projection, S2 file seeding."""

from __future__ import annotations

from tspider_spark.config import CrawlConfig
from tspider_spark.operators.export import (
    export_fields,
    project_headers,
    rebuild_seen_saved,
    urls_for_pocsuite,
)
from tspider_spark.plans.crawl import CrawlEngine
from tspider_spark.plans.oracle import ReferenceOracle
from tspider_spark.sources.corpus import CorpusSpec, corpus_to_spark, generate_corpus


def _crawled_engine(spark, tmp_path):
    docs, seeds = generate_corpus(CorpusSpec(seed=31, n_domains=2))
    cfg = CrawlConfig(tld=True, max_per_host=6)
    e = CrawlEngine(spark, corpus_to_spark(spark, docs), str(tmp_path / "st"), cfg)
    e.seed(seeds)
    e.run()
    return e, docs, seeds, cfg


def test_exports_and_rebuild(spark, tmp_path):
    e, docs, seeds, cfg = _crawled_engine(spark, tmp_path)
    results = e.results()

    assert export_fields(results, ["method", "url"]).columns == ["method", "url"]

    poc = urls_for_pocsuite(results).collect()
    keys = [(r["hostname"], r["pattern"]) for r in poc]
    assert len(keys) == len(set(keys))  # one row per (host, pattern)

    # S6: rebuilding seen_saved from results reproduces the committed set
    rebuilt = {r["saved_key"] for r in rebuild_seen_saved(results).collect()}
    committed = {r["saved_key"] for r in e.store.read("seen_saved").collect()}
    assert rebuilt == committed


def test_project_headers(spark):
    df = spark.createDataFrame(
        [({"Referer": "http://a/", "User-Agent": "x", "Accept": "*", "X-K": "v"},)],
        "headers map<string,string>",
    )
    out = project_headers(df).collect()[0]["headers"]
    assert out == {"Referer": "http://a/", "X-K": "v"}


def test_seed_from_text_file(spark, tmp_path):
    docs, seeds = generate_corpus(CorpusSpec(seed=31, n_domains=2))
    seed_file = tmp_path / "seeds.txt"
    seed_file.write_text("\n".join([seeds[0], "", "  ", seeds[1]]) + "\n")

    cfg = CrawlConfig(tld=True, max_per_host=6)
    oracle = ReferenceOracle(docs, cfg).run([seeds[0], seeds[1]])

    e = CrawlEngine(spark, corpus_to_spark(spark, docs), str(tmp_path / "st2"), cfg)
    e.seed_from_text_file(str(seed_file))
    e.run()
    got = [(r["url"], r["depth"], r["rank"]) for r in e.crawl_order().collect()]
    assert got == oracle.crawl_order


def test_k2_merge_results_idempotent(spark, tmp_path):
    """K2: exists-check upsert — inserting an overlapping batch adds
    only the new (method, pattern) keys; re-running inserts nothing."""
    from pyspark.sql import functions as F

    from tspider_spark.operators.export import merge_results

    e, docs, seeds, cfg = _crawled_engine(spark, tmp_path)
    before = e.store.read("results").count()

    # batch = 2 existing rows + 1 genuinely new pattern
    existing_two = e.results().limit(2)
    new_row = existing_two.limit(1).withColumn(
        "pattern", F.lit("http://new.example.com/only/{digit}")
    ).withColumn("url", F.lit("http://new.example.com/only/7"))
    batch = existing_two.unionByName(new_row)

    assert merge_results(e.store, batch) == 1
    assert e.store.read("results").count() == before + 1
    assert merge_results(e.store, batch) == 0
    assert e.store.read("results").count() == before + 1
