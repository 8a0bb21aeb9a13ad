"""Milestone-4 gate: checkpoint/resume exactness + dedupe idempotence
(Q5/S5, north_rule 'resumable from checkpoint')."""

from __future__ import annotations

import json

from tspider_spark.config import CrawlConfig
from tspider_spark.plans.crawl import CrawlEngine
from tspider_spark.plans.oracle import ReferenceOracle
from tspider_spark.sources.corpus import CorpusSpec, corpus_to_spark, generate_corpus


def _corpus():
    return generate_corpus(CorpusSpec(seed=11, n_domains=3, hosts_per_domain=2))


def test_kill_and_resume_exact(spark, tmp_path):
    """Run k waves, 'kill', re-open the store with a fresh engine,
    finish — final state must equal an uninterrupted run AND the
    sequential oracle."""
    docs, seeds = _corpus()
    cfg = CrawlConfig(tld=True, max_per_host=8)
    oracle = ReferenceOracle(docs, cfg).run(seeds)

    sdocs = corpus_to_spark(spark, docs)
    e1 = CrawlEngine(spark, sdocs, str(tmp_path / "s1"), cfg)
    e1.seed(seeds)
    e1.run(max_waves=2)  # partial crawl, then "killed"

    # resume: a brand-new engine over the same committed store
    e2 = CrawlEngine(spark, sdocs, str(tmp_path / "s1"), cfg)
    e2.run()  # drains remaining waves

    got_order = [(r["url"], r["depth"], r["rank"]) for r in e2.crawl_order().collect()]
    assert got_order == oracle.crawl_order
    got_scanned = {r["scan_key"] for r in e2.store.read("seen_scanned").collect()}
    assert got_scanned == oracle.seen_scanned
    got_budget = {
        r["hostname"]: r["reqcount"] for r in e2.store.read("host_budget").collect()
    }
    assert got_budget == oracle.host_budget


def test_config_restored_from_store_meta(spark, tmp_path):
    """S5 — startup params persist in the manifest (redis_utils.py:225-239)."""
    docs, seeds = _corpus()
    cfg = CrawlConfig(tld=True, max_per_host=7, blocklist=["site0.com"])
    e = CrawlEngine(spark, corpus_to_spark(spark, docs), str(tmp_path / "s2"), cfg)
    e.seed(seeds)
    meta = e.store.meta()["config"]
    restored = CrawlConfig.from_meta(meta)
    assert restored.tld and restored.max_per_host == 7
    assert restored.blocklist == ["site0.com"]


def test_wave_commit_is_atomic(spark, tmp_path):
    """A torn wave (files written, manifest not swapped) must be
    invisible: re-reading the store sees only the committed version."""
    docs, seeds = _corpus()
    cfg = CrawlConfig(max_per_host=5)
    e = CrawlEngine(spark, corpus_to_spark(spark, docs), str(tmp_path / "s3"), cfg)
    e.seed(seeds)
    v_before = e.store.version
    frontier_before = e.store.read("frontier").count()

    # simulate a torn write: dump junk table files without a manifest bump
    junk = spark.createDataFrame([("http://x/", "x", 9, 999, 1)],
                                 "url string, hostname string, depth int, discovery_order long, slot int")
    junk.write.mode("overwrite").parquet(str(tmp_path / "s3" / "frontier" / "v999999"))

    assert e.store.version == v_before
    assert e.store.read("frontier").count() == frontier_before

    # manifest content is well-formed json listing only committed dirs
    m = json.load(open(str(tmp_path / "s3" / "manifest.json")))
    assert all("v999999" not in d for d in m["tables"]["frontier"])


def test_runtime_blocklist_addition(spark, tmp_path):
    """Q7 — domain blocked mid-crawl is re-checked at consume time
    (consumer.py:38): already-scheduled tasks for it are skipped."""
    docs, seeds = _corpus()
    cfg = CrawlConfig(tld=True, max_per_host=8)
    sdocs = corpus_to_spark(spark, docs)

    e = CrawlEngine(spark, sdocs, str(tmp_path / "s4"), cfg)
    e.seed(seeds)
    e.run(max_waves=1)
    blocked_domain = "site1.org"
    e.add_blocklist(blocked_domain)
    e.run()

    # no task on that domain was fetched after the block: no result has
    # a referer from it in later waves
    results = e.store.read("results").collect()
    later = [r for r in results if r["wave"] >= 1]
    assert all(
        blocked_domain not in (r["headers"] or {}).get("Referer", "")
        for r in later
    )


def test_concurrent_commit_detected(spark, tmp_path):
    """Optimistic-concurrency check (Iceberg CommitFailedException
    analog): if another writer swaps the manifest between a commit's
    base read and its own swap, the slower commit must raise and leave
    the store exactly as the winner left it."""
    import pytest

    from tspider_spark.sources.state import ConcurrentCommitError, StateStore

    root = str(tmp_path / "race")
    s1 = StateStore(spark, root)
    s2 = StateStore(spark, root)
    s1.commit(meta={"base": True})  # v1

    # interleave: after s1's base manifest read, s2 lands v2
    orig = s1.manifest
    fired = []

    def racy():
        m = orig()
        if not fired:
            fired.append(1)
            s2.commit(meta={"winner": True})
        return m

    s1.manifest = racy
    with pytest.raises(ConcurrentCommitError):
        s1.commit(meta={"loser": True})

    fresh = StateStore(spark, root)
    assert fresh.version == 2
    assert fresh.meta().get("winner") is True
    assert "loser" not in fresh.meta()


def test_concurrent_compaction_detected(spark, tmp_path):
    """compact() swaps a wholesale manifest from its base read — a
    commit landing mid-rewrite must abort the compaction, not vanish."""
    import pytest

    from tspider_spark.sources.state import (
        SCHEMAS, ConcurrentCommitError, StateStore,
    )

    root = str(tmp_path / "crace")
    s1 = StateStore(spark, root)
    s2 = StateStore(spark, root)
    row = spark.createDataFrame([("h", "h/a")], SCHEMAS["seen_scanned"])
    s1.commit(appends={"seen_scanned": row})  # v1
    s1.commit(appends={"seen_scanned": row})  # v2 -> two dirs to compact

    orig = s1.manifest
    fired = []

    def racy():
        m = orig()
        if not fired:
            fired.append(1)
            s2.commit(appends={"seen_scanned": row})  # v3 lands mid-compact
        return m

    s1.manifest = racy
    with pytest.raises(ConcurrentCommitError):
        s1.compact(["seen_scanned"])

    fresh = StateStore(spark, root)
    assert fresh.version == 3
    assert fresh.read("seen_scanned").count() == 3  # nothing lost


def test_submit_cli_authority_resume(spark, tmp_path):
    """--host-priorities CLI path: a kill-and-resume authority-mode
    crawl via submit_crawl.main equals one uninterrupted run of the
    sequential priority oracle (mode restored from store meta, table
    re-supplied like --documents)."""
    from tspider_spark.functions.urlpure import parse_url
    from tspider_spark.submit_crawl import main

    docs, seeds = _corpus()
    hosts = sorted({parse_url(d).hostname for d, _ in docs})
    prios = {h: i for i, h in enumerate(reversed(hosts))}
    cfg = CrawlConfig(tld=True, max_per_host=6, priority="authority")
    oracle = ReferenceOracle(docs, cfg, host_priorities=prios).run(seeds)

    docs_path = str(tmp_path / "docs")
    corpus_to_spark(spark, docs).write.parquet(docs_path)
    pr_path = str(tmp_path / "prios")
    spark.createDataFrame(
        list(prios.items()), "hostname string, priority long"
    ).write.parquet(pr_path)

    state = str(tmp_path / "state")
    base = ["--documents", docs_path, "--state", state,
            "--host-priorities", pr_path, "--tld", "--max-per-host", "6"]
    main(base + ["--seeds"] + seeds + ["--max-waves", "2"], stop_session=False)
    main(base + ["--resume"], stop_session=False)

    eng = CrawlEngine(
        spark, spark.read.parquet(docs_path), state, cfg,
        host_priorities=spark.read.parquet(pr_path),
    )
    got = [(r["url"], r["depth"], r["rank"])
           for r in eng.crawl_order().collect()]
    assert got == oracle.crawl_order
