"""Milestone-5 gate: robots disallow + crawl-delay politeness
(north_rule extension; empty table == reference parity)."""

from __future__ import annotations

from tspider_spark.config import CrawlConfig
from tspider_spark.operators.robots import ROBOTS_SCHEMA
from tspider_spark.plans.crawl import CrawlEngine
from tspider_spark.plans.oracle import ReferenceOracle
from tspider_spark.sources.corpus import CorpusSpec, corpus_to_spark, generate_corpus


def test_robots_disallow_and_delay_parity(spark, tmp_path):
    docs, seeds = generate_corpus(CorpusSpec(seed=21, n_domains=3, hosts_per_domain=2))
    hosts = sorted({d.split("/")[2] for d, _ in docs})
    rhost = hosts[0]
    robots_rows = [(rhost, ["/item/", "/cat.php"], 500)]

    cfg = CrawlConfig(tld=True, max_per_host=10, robots_enabled=True)
    oracle = ReferenceOracle(
        docs, cfg, robots={h: (p, d) for h, p, d in robots_rows}
    ).run(seeds)
    # robots actually bit: no disallowed path of rhost was scheduled
    assert all(
        not (u.startswith(f"http://{rhost}/item/") or u.startswith(f"http://{rhost}/cat.php"))
        for u, _, _ in oracle.crawl_order
    )

    robots_df = spark.createDataFrame(robots_rows, ROBOTS_SCHEMA)
    engine = CrawlEngine(
        spark, corpus_to_spark(spark, docs), str(tmp_path / "state"), cfg,
        robots=robots_df,
    )
    engine.seed(seeds)
    engine.run()

    got = [(r["url"], r["depth"], r["rank"]) for r in engine.crawl_order().collect()]
    assert got == oracle.crawl_order

    # crawl-delay pacing: k-th same-host task planned at (k-1)*delay
    f = engine.store.read("frontier").filter(f"hostname = '{rhost}'").collect()
    if f:
        per_wave = {}
        for r in f:
            per_wave.setdefault(r["depth"], []).append(
                (r["slot"], r["planned_offset_ms"])
            )
        for rows in per_wave.values():
            for slot, off in rows:
                assert off == (slot - 1) * 500


def test_empty_robots_is_reference_parity(spark, tmp_path):
    docs, seeds = generate_corpus(CorpusSpec(seed=21, n_domains=2))
    cfg_off = CrawlConfig(tld=True, max_per_host=8)
    cfg_on = CrawlConfig(tld=True, max_per_host=8, robots_enabled=True)
    base = ReferenceOracle(docs, cfg_off).run(seeds)
    with_empty = ReferenceOracle(docs, cfg_on, robots={}).run(seeds)
    assert base.crawl_order == with_empty.crawl_order
