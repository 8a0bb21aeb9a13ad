"""admit_wave physical modes must be algebraically identical: the
reduce_first pre-aggregation (legacy), the pure-window fold, and the
explicit host-repartitioned fold are three plans for the same
sequential admission semantics (SURVEY.md §2.3 F8/F9/A2)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tspider_spark.operators.schedule import admit_wave, admit_wave_salted


def _workload(seed: int, n: int = 400, hosts: int = 7):
    """Randomized candidate stream with duplicates, synthetic
    index-page rows, and some hosts carrying prior budget."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        h = f"h{rng.randrange(hosts)}.com"
        key = f"{h}//p/{rng.randrange(25)}"
        synth = 0 if rng.random() < 0.1 else 1
        if synth == 0:
            key = f"{h}//"
        rows.append((h, key, f"http://{key}", i, rng.randrange(3), synth))
    budget = [(f"h{i}.com", rng.choice([0, 0, 2, 5])) for i in range(hosts)]
    return rows, budget


def _oracle(rows, budget, cap):
    """Direct sequential fold of the reference semantics."""
    prior = dict(budget)
    seen, admitted = set(), []
    for h, key, url, rank, seq, synth in sorted(
        rows, key=lambda r: (r[3], r[4], r[5])
    ):
        count = prior.get(h, 0)
        if synth == 0 and count != 0:
            continue  # A2 fires only for fresh hosts
        if key in seen:
            continue  # F8 within-wave
        if count > cap:
            continue  # F9 strict '>'
        seen.add(key)
        prior[h] = count + 1
        admitted.append((h, key, url))
    return sorted(admitted)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_modes_agree_and_match_oracle(spark, seed):
    cap = 4
    rows, budget = _workload(seed)
    cands = spark.createDataFrame(
        rows,
        "hostname string, scan_key string, url string, "
        "task_rank long, seq int, synth_rank int",
    )
    bdf = spark.createDataFrame(budget, "hostname string, reqcount long")

    def run(**kw):
        out = admit_wave(cands, bdf, cap, **kw)
        return sorted(
            (r["hostname"], r["scan_key"], r["url"]) for r in out.collect()
        )

    expected = _oracle(rows, budget, cap)
    assert run(reduce_first=True) == expected
    assert run(reduce_first=False) == expected
    assert run(reduce_first=True, partitions=5) == expected
    # pre-partitioned input, no extra exchange requested
    pre = cands.repartition(3, "hostname")
    out = admit_wave(pre, bdf, cap, reduce_first=False)
    assert sorted(
        (r["hostname"], r["scan_key"], r["url"]) for r in out.collect()
    ) == expected

    # skew path: salted fold is exact too
    for s_buckets in (1, 4):
        out = admit_wave_salted(cands, bdf, cap, s_buckets, partitions=5)
        assert sorted(
            (r["hostname"], r["scan_key"], r["url"]) for r in out.collect()
        ) == expected

    # dictionary-coded host keys (code = xxhash64(hostname), hostname
    # kept as a tie key): pure physical choice, identical admissions
    coded = cands.withColumn("_hc", F.xxhash64("hostname")).repartition(
        5, "_hc"
    )
    out = admit_wave(coded, bdf, cap, reduce_first=False, code_col="_hc")
    assert "_hc" not in out.columns
    assert sorted(
        (r["hostname"], r["scan_key"], r["url"]) for r in out.collect()
    ) == expected


def test_salted_crawl_matches_unsalted(spark, tmp_path):
    """Full engine parity: salting is a pure physical choice — crawl
    order, seen set, and results are bit-identical."""
    from tspider_spark.config import CrawlConfig
    from tspider_spark.plans.crawl import CrawlEngine
    from tspider_spark.sources.corpus import (
        CorpusSpec,
        corpus_to_spark,
        generate_corpus,
    )

    docs, seeds = generate_corpus(CorpusSpec(seed=11, n_domains=2, hosts_per_domain=2))
    ddf = corpus_to_spark(spark, docs)

    def crawl(salt):
        cfg = CrawlConfig(tld=True, max_per_host=6, salt_buckets=salt)
        eng = CrawlEngine(spark, ddf, str(tmp_path / f"s{salt}"), cfg)
        eng.seed(seeds)
        eng.run()
        order = [
            (r["url"], r["depth"], r["rank"])
            for r in eng.crawl_order().collect()
        ]
        scanned = {
            r["scan_key"] for r in eng.store.read("seen_scanned").collect()
        }
        return order, scanned

    assert crawl(0) == crawl(8)


def test_crawl_makespan_bounds(spark):
    """LB(W) = max(slowest host, ceil(total/W)); a single hot host
    dominates however many workers you add."""
    from tspider_spark.operators.schedule import crawl_makespan

    tasks = spark.createDataFrame(
        [("hot", f"u{i}") for i in range(100)]
        + [("a", "x"), ("b", "y"), ("c", "z")],
        "hostname string, url string",
    )
    delays = spark.createDataFrame(
        [("hot", 1000), ("a", 0)], "host string, crawl_delay_ms int"
    )
    out = {r["n_workers"]: r for r in
           crawl_makespan(tasks, delays, workers=(2, 64),
                          fetch_ms=200).collect()}
    # hot host: 100 * 1000 ms = 100000; a/b/c: 200 each; total 100600
    for w, r in out.items():
        assert r["n_hosts"] == 4 and r["n_tasks"] == 103
        assert r["max_host_ms"] == 100_000
        assert r["total_ms"] == 100_600
    assert out[2]["makespan_lb_ms"] == 100_000       # > ceil(100600/2)
    assert out[64]["makespan_lb_ms"] == 100_000      # host-bound: W moot
    assert out[2]["utilization"] == 0.503
    # at 64 workers utilization collapses -> adding executors is waste
    assert out[64]["utilization"] < 0.025
