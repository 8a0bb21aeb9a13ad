"""Scale-safe cuckoo probe default (r4 verdict item 6) + shard-layout
guards (r4 ADVICE): cuckoo_probe now defaults to "auto", which
resolves to the copart regime — measured faster at 10M keys AND the
only regime that survives 10^10 — whenever the provisioned filter
exceeds cuckoo_broadcast_max_bytes; broadcast stays an explicit
opt-in (or the auto pick for tiny provisioned crawls). The engine
refuses to probe a persisted filter under a different shard layout:
keys hash to shards modulo bloom_shards, so a layout change yields
false negatives that bypass the exact anti-join and re-admit crawled
URLs."""

from __future__ import annotations

import pandas as pd
import pytest

from tspider_spark.config import CrawlConfig
from tspider_spark.plans.crawl import CrawlEngine
from tspider_spark.sources.corpus import (
    CorpusSpec,
    corpus_to_spark,
    generate_corpus,
)


def test_auto_probe_resolves_by_provisioned_size():
    # default capacity (4.2M keys ~ 11 MB) is above the 8 MB broadcast
    # cap -> a default-config engine runs the scale-safe copart regime
    assert CrawlConfig().resolved_cuckoo_probe() == "copart"
    # tiny provisioned crawls stay broadcast under auto
    assert (
        CrawlConfig(cuckoo_capacity=1 << 20).resolved_cuckoo_probe()
        == "broadcast"
    )
    # explicit choices are honored regardless of size
    assert (
        CrawlConfig(
            cuckoo_capacity=1 << 30, cuckoo_probe="broadcast"
        ).resolved_cuckoo_probe()
        == "broadcast"
    )
    assert (
        CrawlConfig(
            cuckoo_capacity=1 << 10, cuckoo_probe="copart"
        ).resolved_cuckoo_probe()
        == "copart"
    )


def test_bloom_shards_round_trips_through_meta():
    cfg = CrawlConfig(bloom_shards=16)
    assert CrawlConfig.from_meta(cfg.to_meta()).bloom_shards == 16


def test_engine_rejects_mismatched_shard_layout(spark, tmp_path):
    docs, seeds = generate_corpus(
        CorpusSpec(seed=5, n_domains=2, hosts_per_domain=2)
    )
    sdf = corpus_to_spark(spark, docs)
    cfg = CrawlConfig(
        tld=True, max_per_host=4, cuckoo_filter=True, bloom_shards=4,
        cuckoo_capacity=1 << 12,
    )
    eng = CrawlEngine(spark, sdf, str(tmp_path / "state"), cfg)
    eng.seed(seeds)
    eng.run(max_waves=1)
    assert eng.store.manifest()["tables"].get("seen_filter")

    cfg2 = CrawlConfig(
        tld=True, max_per_host=4, cuckoo_filter=True, bloom_shards=8,
        cuckoo_capacity=1 << 12,
    )
    eng2 = CrawlEngine(spark, sdf, str(tmp_path / "state"), cfg2)
    with pytest.raises(RuntimeError, match="bloom_shards"):
        eng2.run(max_waves=1)


def test_copart_probe_rejects_duplicate_shard_rows(spark):
    from tspider_spark.operators.dedupe import (
        CuckooFilter,
        _flag_maybe_cuckoo_copart,
    )
    from pyspark.sql import functions as F

    cf = CuckooFilter(64)
    cf.add_batch(pd.Series(["k1", "k2"]).to_numpy(dtype=object))
    row = (0, cf.to_bytes(), cf.n_buckets)
    dup = spark.createDataFrame(
        [row, row], "shard int, tbl binary, n_buckets long"
    )
    cands = spark.createDataFrame([("k1",), ("k3",)], "scan_key string")
    with pytest.raises(Exception, match="persisted rows"):
        _flag_maybe_cuckoo_copart(cands, dup, "scan_key", 1).collect()
