"""Milestone-3 gate (north_rule): the distributed wave-loop engine must
match the sequential reference oracle EXACTLY — crawl order, seen
sets, per-host budgets, and saved results — on the synthetic corpus,
under several scope configurations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tspider_spark.config import CrawlConfig
from tspider_spark.plans.crawl import CrawlEngine
from tspider_spark.plans.oracle import ReferenceOracle
from tspider_spark.sources.corpus import CorpusSpec, corpus_to_spark, generate_corpus


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(
        CorpusSpec(seed=42, n_domains=4, hosts_per_domain=2, hot_host_pages=30)
    )


def run_both(spark, tmp_path, corpus, cfg: CrawlConfig, seeds=None, max_waves=None):
    docs, default_seeds = corpus
    seeds = seeds if seeds is not None else default_seeds
    oracle = ReferenceOracle(docs, cfg).run(seeds)

    engine = CrawlEngine(
        spark, corpus_to_spark(spark, docs), str(tmp_path / "state"), cfg
    )
    engine.seed(seeds)
    engine.run(max_waves=max_waves)
    return oracle, engine


def assert_parity(oracle, engine):
    got_order = [
        (r["url"], r["depth"], r["rank"])
        for r in engine.crawl_order().collect()
    ]
    assert got_order == oracle.crawl_order

    got_scanned = {
        r["scan_key"] for r in engine.store.read("seen_scanned").collect()
    }
    assert got_scanned == oracle.seen_scanned

    got_saved = {r["saved_key"] for r in engine.store.read("seen_saved").collect()}
    assert got_saved == oracle.seen_saved

    got_budget = {
        r["hostname"]: r["reqcount"]
        for r in engine.store.read("host_budget").collect()
    }
    assert got_budget == oracle.host_budget

    got_results = [
        (
            r["method"], r["url"], r["postdata"], r["type"], r["pattern"],
            r["hostname"], r["domain"], r["is_target"],
        )
        for r in engine.results().collect()
    ]
    assert got_results == oracle.results


def test_default_scope(spark, tmp_path, corpus):
    cfg = CrawlConfig(tld=False, max_per_host=10)
    oracle, engine = run_both(spark, tmp_path, corpus, cfg)
    assert len(oracle.crawl_order) > 20, "corpus too inert to be a real test"
    assert_parity(oracle, engine)


def test_tld_scope_and_budget_cap(spark, tmp_path, corpus):
    """tld=True widens scope to whole registered domains; a small cap
    forces the F9 budget window to bite on the hot host."""
    cfg = CrawlConfig(tld=True, max_per_host=5)
    oracle, engine = run_both(spark, tmp_path, corpus, cfg)
    assert max(oracle.host_budget.values()) == 6  # strict '>' => cap+1
    assert_parity(oracle, engine)


def test_blocklist_suffix_walk(spark, tmp_path):
    # needs hosts_per_domain >= 3 so the a.b.c.d.<domain> hosts exist
    corpus = generate_corpus(
        CorpusSpec(seed=43, n_domains=3, hosts_per_domain=3, hot_host_pages=15)
    )
    docs, seeds = corpus
    hosts = {d.split("/")[2] for d, _ in docs}
    deep = next(h for h in hosts if h.startswith("a.b.c.d."))
    # block 'c.d.<domain>' — must block a.b.c.d.<domain> via the walk
    blocked_entry = "c.d." + deep.split(".", 4)[4]
    cfg = CrawlConfig(tld=True, max_per_host=10, blocklist=[blocked_entry])
    oracle, engine = run_both(spark, tmp_path, corpus, cfg)
    assert all(deep not in u for u, _, _ in oracle.crawl_order)
    assert_parity(oracle, engine)


def test_bloom_prefilter_is_transparent(spark, tmp_path, corpus):
    cfg = CrawlConfig(tld=True, max_per_host=8, use_bloom_prefilter=True)
    oracle, engine = run_both(spark, tmp_path, corpus, cfg)
    assert_parity(oracle, engine)


def test_noncanonical_seed(spark, tmp_path, corpus):
    """Bare-host seed exercises T1 at seed time (S1)."""
    docs, seeds = corpus
    assert any("://" not in s for s in seeds)  # corpus guarantees one
    cfg = CrawlConfig(tld=False, max_per_host=10)
    oracle, engine = run_both(spark, tmp_path, corpus, cfg)
    assert_parity(oracle, engine)


def test_parity_on_alternate_corpus_seed(spark, tmp_path):
    """Different corpus seed => different URL shapes, link graph, and
    hot-host layout; parity must hold regardless (guards against
    fixtures-only correctness)."""
    corpus = generate_corpus(
        CorpusSpec(seed=1337, n_domains=3, hosts_per_domain=2, hot_host_pages=12)
    )
    oracle, engine = run_both(
        spark, tmp_path, corpus, CrawlConfig(tld=True, max_per_host=7)
    )
    assert len(oracle.crawl_order) > 20, "corpus too inert to be a real test"
    assert_parity(oracle, engine)


def test_authority_priority_mode_matches_oracle(spark, tmp_path, corpus):
    """cfg.priority='authority': within each depth, hosts drain by
    ascending priority (unranked hosts last, discovery order). The
    budget-admitted SET legitimately differs from BFS (priority
    crawling is the point); exactness is pinned against the oracle's
    sequential priority drain."""
    from tspider_spark.functions.urlpure import parse_url

    docs, seeds = corpus
    hosts = sorted({d.split("/")[2] for d, _ in docs})
    # reverse-alphabetical priorities invert the natural drain order,
    # and leave one host unranked to exercise the drain-last fallback
    ranked = list(reversed(hosts))[:-1]
    prios = {h: i for i, h in enumerate(ranked)}

    cfg = CrawlConfig(tld=True, max_per_host=5, priority="authority")
    oracle = ReferenceOracle(docs, cfg, host_priorities=prios).run(seeds)

    pr_df = spark.createDataFrame(
        list(prios.items()), "hostname string, priority long"
    )
    engine = CrawlEngine(
        spark, corpus_to_spark(spark, docs), str(tmp_path / "state"), cfg,
        host_priorities=pr_df,
    )
    engine.seed(seeds)
    engine.run()
    assert_parity(oracle, engine)

    # and the mode actually reorders: BFS on the same corpus/config
    # yields a different crawl order (same seeds rank first either way)
    bfs = ReferenceOracle(docs, CrawlConfig(tld=True, max_per_host=5)).run(seeds)
    assert [u for u, _, _ in bfs.crawl_order] != [
        u for u, _, _ in oracle.crawl_order
    ]


def test_opic_priorities_drive_authority_mode(spark, tmp_path, corpus):
    """OPIC's actual use case (Abiteboul et al. 2003 §1: crawl the
    most-important page next): derive host priorities from OPIC over
    the corpus's own host link graph and feed them into the engine's
    authority mode — distributed order must match the oracle's
    sequential priority drain exactly."""
    from tspider_spark.operators.graph import opic
    from tspider_spark.operators.schedule import rank_hosts_by_score

    docs, seeds = corpus
    edges = set()
    for url, spans in docs:
        src = url.split("/")[2]
        for kind, text, _, _ in spans:
            if kind in ("link", "request") and text.startswith("http"):
                dst = text.split("/")[2]
                if dst != src:
                    edges.add((src, dst))
    assert len(edges) > 3, "corpus link graph too small to rank"
    e_df = spark.createDataFrame(sorted(edges), "src string, dst string")
    scores = opic(e_df, rounds=5).select(
        F.col("node").alias("hostname"), F.col("importance").alias("score")
    )
    pr_df = rank_hosts_by_score(scores)
    prios = {r["hostname"]: r["priority"] for r in pr_df.collect()}

    cfg = CrawlConfig(tld=True, max_per_host=5, priority="authority")
    oracle = ReferenceOracle(docs, cfg, host_priorities=prios).run(seeds)
    engine = CrawlEngine(
        spark, corpus_to_spark(spark, docs), str(tmp_path / "state"), cfg,
        host_priorities=pr_df,
    )
    engine.seed(seeds)
    engine.run()
    assert_parity(oracle, engine)


def test_rank_hosts_by_score_dense_desc(spark):
    from tspider_spark.operators.schedule import rank_hosts_by_score

    df = spark.createDataFrame(
        [("a.com", 0.1), ("b.com", 0.7), ("c.com", 0.7), ("d.com", 0.05)],
        "hostname string, score double",
    )
    got = {r["hostname"]: r["priority"] for r in rank_hosts_by_score(df).collect()}
    # desc score; equal scores tie-break by hostname asc
    assert got == {"b.com": 0, "c.com": 1, "a.com": 2, "d.com": 3}


def test_max_depth_limits_scheduling(spark, tmp_path, corpus):
    """cfg.max_depth: results still save at any depth, but no task
    deeper than the cap is ever scheduled — exact vs the extended
    oracle, and strictly shorter than the unlimited crawl."""
    docs, seeds = corpus
    cfg = CrawlConfig(tld=True, max_per_host=8, max_depth=1)
    oracle = ReferenceOracle(docs, cfg).run(seeds)
    unlimited = ReferenceOracle(
        docs, CrawlConfig(tld=True, max_per_host=8)
    ).run(seeds)
    assert len(oracle.crawl_order) < len(unlimited.crawl_order)
    assert max(d for _, d, _ in oracle.crawl_order) == 1

    engine = CrawlEngine(
        spark, corpus_to_spark(spark, docs), str(tmp_path / "state"), cfg
    )
    engine.seed(seeds)
    engine.run()
    assert_parity(oracle, engine)

    # round-trips through the store meta
    assert CrawlConfig.from_meta(engine.store.meta()["config"]).max_depth == 1


def test_slim_fold_path_matches_default(spark, tmp_path, corpus):
    """cfg.slim_fold=True (the opt-in narrow-exchange fold for
    network-shuffle regimes) must produce byte-identical crawl output
    to the default wide fold — same fold algebra on the same keys,
    payload recovered by the broadcast probe."""
    docs, seeds = corpus
    runs = {}
    for slim in (False, True):
        cfg = CrawlConfig(tld=True, max_per_host=5, slim_fold=slim)
        engine = CrawlEngine(
            spark, corpus_to_spark(spark, docs),
            str(tmp_path / f"state_{slim}"), cfg,
        )
        engine.seed(seeds)
        engine.run()
        runs[slim] = (
            [(r["url"], r["depth"], r["rank"])
             for r in engine.crawl_order().collect()],
            {r["scan_key"]
             for r in engine.store.read("seen_scanned").collect()},
        )
    assert runs[True] == runs[False]
