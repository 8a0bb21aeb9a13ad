"""Deletion-driven re-admission (remove_blocklist — the inverse of
the reference's tools/block_domain.py): a domain blocked at wave k and
unblocked later gets its dropped tasks forgotten from the seen set
(exact table + persistent cuckoo shards) and scheduled again.

Timeline fixture (tld scope, one registered domain a.com):
  www.a.com/      -> links alpha, b.a.com/x
  www.a.com/alpha    -> links beta
  www.a.com/beta    -> links b.a.com/x   (rediscovery source)
  b.a.com/x       -> links b.a.com/y
  b.a.com/y       (leaf)
"""

from __future__ import annotations

import zlib

import pytest

from tspider_spark.config import CrawlConfig
from tspider_spark.operators.dedupe import CuckooFilter
from tspider_spark.plans.crawl import CrawlEngine
from tspider_spark.sources.corpus import corpus_to_spark

DOCS = [
    ("http://www.a.com/", [
        ("link", "http://www.a.com/alpha", None, 0),
        ("link", "http://b.a.com/x", None, 1),
    ]),
    ("http://www.a.com/alpha", [("link", "http://www.a.com/beta", None, 0)]),
    ("http://www.a.com/beta", [("link", "http://b.a.com/x", None, 0)]),
    ("http://b.a.com/x", [("link", "http://b.a.com/y", None, 0)]),
    ("http://b.a.com/y", [("text", "leaf", None, 0)]),
]


def _engine(spark, path, **cfg_kw):
    cfg = CrawlConfig(tld=True, max_per_host=10, **cfg_kw)
    return CrawlEngine(spark, corpus_to_spark(spark, DOCS), str(path), cfg)


def _urls_fetched(engine):
    """URLs whose frontier task actually produced a fetch (doc match)
    — reconstructed from saved results' wave provenance is overkill;
    the frontier rows per depth that were not blocked at their wave
    suffice for these scenarios, so just return the crawl order."""
    return [r["url"] for r in engine.crawl_order().collect()]


def _scan_key(engine, hostname):
    rows = engine.store.read("seen_scanned").filter(
        f"hostname = '{hostname}'"
    ).collect()
    return {r["scan_key"] for r in rows}


def test_block_then_unblock_readmits(spark, tmp_path):
    eng = _engine(spark, tmp_path / "s")
    eng.seed(["http://www.a.com/"])
    eng.wave()  # depth 0: admits alpha + b.a.com/x at depth 1
    assert _scan_key(eng, "b.a.com"), "x must be scheduled before the block"

    eng.add_blocklist("b.a.com")
    eng.wave()  # depth 1: drops b.a.com/x (recorded), fetches alpha

    blocked = eng.store.read("blocked_tasks").collect()
    # x itself plus the A2-synthesized index page for the new host
    assert {r["url"] for r in blocked} == {
        "http://b.a.com/x", "http://b.a.com/",
    }

    n = eng.remove_blocklist("b.a.com")
    assert n == 2
    assert eng.cfg.blocklist == []
    assert eng.store.read("blocked_tasks").isEmpty()
    # re-admitted at the CURRENT depth with a fresh discovery_order
    meta = eng.store.meta()
    readmitted = eng.store.read("frontier").filter(
        "hostname = 'b.a.com'"
    ).collect()
    assert {r["depth"] for r in readmitted} == {1, 2}  # history + new rows
    assert int(meta["next_depth"]) == 2
    # seen set re-contains exactly the re-admitted tasks' keys
    assert len(_scan_key(eng, "b.a.com")) == 2

    eng.run()  # drain: depth 2 fetches beta + x, depth 3 fetches y
    order = _urls_fetched(eng)
    # x appears twice in the frontier log (dropped history + re-admit)
    assert order.count("http://b.a.com/x") == 2
    # but its child was admitted exactly once, from the re-admitted row
    assert order.count("http://b.a.com/y") == 1
    # beta's re-link to x at depth 2 was suppressed by the seen set
    assert len(_scan_key(eng, "b.a.com")) == 3  # /, x, y
    budget = {
        r["hostname"]: r["reqcount"]
        for r in eng.store.read("host_budget").collect()
    }
    assert budget["b.a.com"] == 3  # /, x, y — each booked once


def test_unblock_no_readmit_allows_rediscovery(spark, tmp_path):
    eng = _engine(spark, tmp_path / "s")
    eng.seed(["http://www.a.com/"])
    eng.wave()
    eng.add_blocklist("b.a.com")
    eng.wave()  # drops x, schedules beta

    n = eng.remove_blocklist("b.a.com", readmit=False)
    assert n == 0
    # the keys (x + the synthesized index page) were forgotten...
    assert _scan_key(eng, "b.a.com") == set()
    # ...so beta's link to x at the next wave re-admits it fresh — and
    # with the budget refunded, b.a.com is a "new host" again, so the
    # A2 index synthesis also re-fires
    eng.run()
    order = _urls_fetched(eng)
    assert order.count("http://b.a.com/x") == 2  # dropped history + rediscovery
    assert order.count("http://b.a.com/") == 2  # dropped history + re-synth
    assert order.count("http://b.a.com/y") == 1
    assert len(_scan_key(eng, "b.a.com")) == 3  # /, x, y — re-booked


def test_unblock_noop_when_nothing_recorded(spark, tmp_path):
    eng = _engine(spark, tmp_path / "s")
    eng.seed(["http://www.a.com/"])
    eng.add_blocklist("never-seen.com")
    assert eng.remove_blocklist("never-seen.com") == 0
    assert eng.cfg.blocklist == []


@pytest.mark.parametrize("readmit", [True, False])
def test_cuckoo_path_matches_exact_and_forgets(spark, tmp_path, readmit):
    """Same scenario on the persistent cuckoo filter: identical crawl,
    and the stored shards demonstrably forget the dropped key."""
    ex = _engine(spark, tmp_path / "exact")
    ck = _engine(spark, tmp_path / "cuckoo", cuckoo_filter=True,
                 cuckoo_capacity=1 << 12)
    for eng in (ex, ck):
        eng.seed(["http://www.a.com/"])
        eng.wave()
        eng.add_blocklist("b.a.com")
        eng.wave()

    key = next(iter(_scan_key(ck, "b.a.com")))

    def shard_contains(eng, k):
        rows = eng.store.read("seen_filter").collect()
        sh = zlib.crc32(k.encode()) % eng.cfg.bloom_shards
        for r in rows:
            if int(r["shard"]) == sh:
                return k in CuckooFilter.from_bytes(
                    bytes(r["tbl"]), int(r["n_buckets"])
                )
        return False

    assert shard_contains(ck, key), "filter must contain the key pre-unblock"
    for eng in (ex, ck):
        eng.remove_blocklist("b.a.com", readmit=readmit)

    if readmit:
        # deleted then re-added in the same commit
        assert shard_contains(ck, key)
    else:
        assert not shard_contains(ck, key), "cuckoo shards must forget"

    for eng in (ex, ck):
        eng.run()
    assert _urls_fetched(ex) == _urls_fetched(ck)
    assert (
        ex.results().drop("save_order").collect()
        == ck.results().drop("save_order").collect()
    )
    # the maintained filter mirrors the exact seen table at the end
    final_keys = {
        r["scan_key"] for r in ck.store.read("seen_scanned").collect()
    }
    assert all(shard_contains(ck, k) for k in final_keys)


def test_cuckoo_copart_probe_matches_exact(spark, tmp_path):
    """cuckoo_probe='copart' (r3 verdict finding #4): the shard table
    is probed via the co-partitioned cogroup — the filter never leaves
    the executors during the wave loop — and the crawl is identical to
    the exact path through a full block/unblock/readmit cycle."""
    ex = _engine(spark, tmp_path / "exact")
    cp = _engine(
        spark, tmp_path / "copart", cuckoo_filter=True,
        cuckoo_capacity=1 << 12, cuckoo_probe="copart",
    )
    for eng in (ex, cp):
        eng.seed(["http://www.a.com/"])
        eng.wave()
        eng.add_blocklist("b.a.com")
        eng.wave()
        eng.remove_blocklist("b.a.com")
        eng.run()
    assert _urls_fetched(ex) == _urls_fetched(cp)
    assert (
        ex.results().drop("save_order").collect()
        == cp.results().drop("save_order").collect()
    )
    # the maintained shards mirror the exact seen table at the end
    # (collect here is test-side verification, not an engine path)
    rows = cp.store.read("seen_filter").collect()
    filters = {
        int(r["shard"]): CuckooFilter.from_bytes(
            bytes(r["tbl"]), int(r["n_buckets"])
        )
        for r in rows
    }
    final_keys = {
        r["scan_key"] for r in cp.store.read("seen_scanned").collect()
    }
    assert final_keys
    for k in final_keys:
        assert k in filters[zlib.crc32(k.encode()) % cp.cfg.bloom_shards]


def test_unblock_domain_tool(spark, tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import unblock_domain

    eng = _engine(spark, tmp_path / "s")
    eng.seed(["http://www.a.com/"])
    eng.wave()
    eng.add_blocklist("b.a.com")
    eng.wave()

    n = unblock_domain.main([str(tmp_path / "s"), "b.a.com"], spark=spark)
    assert n == 2  # x + the A2-synthesized index page
    # a fresh engine resumed from the store picks up the restored task
    cfg = CrawlConfig.from_meta(eng.store.meta()["config"])
    assert cfg.blocklist == []
    eng2 = CrawlEngine(
        spark, corpus_to_spark(spark, DOCS), str(tmp_path / "s"), cfg
    )
    eng2.run()
    assert "http://b.a.com/y" in _urls_fetched(eng2)
