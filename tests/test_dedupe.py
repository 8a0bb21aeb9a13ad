"""Unit tests for the seen-set library: bloom shards, cuckoo deletion,
anti-join transparency (SURVEY.md §4 custom-lite component)."""

from __future__ import annotations

import pytest

from tspider_spark.operators.dedupe import (
    BloomFilter,
    CuckooFilter,
    anti_join_seen,
    build_bloom_shards,
)


class TestBloom:
    def test_no_false_negatives(self):
        bf = BloomFilter(1000, 0.01)
        keys = [f"http://h{i}.com/p/{i}" for i in range(1000)]
        for k in keys:
            bf.add(k)
        assert all(k in bf for k in keys)

    def test_fpp_reasonable(self):
        bf = BloomFilter(1000, 0.01)
        for i in range(1000):
            bf.add(f"key-{i}")
        fp = sum(f"other-{i}" in bf for i in range(10000))
        assert fp < 300  # ~1% nominal, generous bound

    def test_roundtrip(self):
        bf = BloomFilter(100, 0.01)
        bf.add("x")
        bf2 = BloomFilter.from_bytes(bf.to_bytes(), bf.m, bf.k)
        assert "x" in bf2 and "y" not in bf2


class TestCuckoo:
    def test_add_contains_delete(self):
        cf = CuckooFilter(5000)
        keys = [f"http://h/{i}" for i in range(3000)]
        ok = [cf.add(k) for k in keys]
        assert all(ok)
        assert all(k in cf for k in keys)
        # delete half, they must disappear; others must remain
        for k in keys[::2]:
            assert cf.delete(k)
        assert all(k in cf for k in keys[1::2])
        missing = sum(k not in cf for k in keys[::2])
        assert missing > len(keys[::2]) * 0.95  # fp collisions allowed

    def test_deterministic(self):
        a, b = CuckooFilter(100), CuckooFilter(100)
        for i in range(80):
            a.add(f"k{i}")
            b.add(f"k{i}")
        assert (a.table == b.table).all()

    def test_batch_matches_scalar(self):
        a, b = CuckooFilter(2000), CuckooFilter(2000)
        keys = [f"http://h{i}.com/{i}" for i in range(1500)]
        assert a.add_batch(keys) == 0
        for k in keys:
            assert b.add(k)
        assert (a.table == b.table).all()
        assert a.contains_batch(keys).all()
        assert a.delete_batch(keys[:700]) == 0
        assert a.contains_batch(keys[700:]).all()

    def test_serialization_roundtrip(self):
        cf = CuckooFilter(500)
        cf.add_batch([f"k{i}" for i in range(400)])
        cf2 = CuckooFilter.from_bytes(cf.to_bytes(), cf.n_buckets)
        assert (cf.table == cf2.table).all()
        assert cf2.delete("k0") and "k1" in cf2
        assert cf.occupancy == cf2.occupancy + 1


def test_cuckoo_shard_df_build_delta_probe(spark):
    """Distributed shard lifecycle: bootstrap -> add delta -> delete
    delta, with the anti-join staying exact throughout."""
    from tspider_spark.operators.dedupe import (
        anti_join_seen_cuckoo,
        apply_cuckoo_delta,
        build_cuckoo_shard_df,
    )

    seen = spark.createDataFrame(
        [(f"key-{i}",) for i in range(300)], "scan_key string"
    )
    filt = build_cuckoo_shard_df(seen, "scan_key", 4, 1024)
    # add a delta, then delete part of the original set
    adds = spark.createDataFrame(
        [(f"key-{i}",) for i in range(300, 400)], "scan_key string"
    )
    filt = apply_cuckoo_delta(filt, adds, "scan_key", 4, 1024, op="add")
    dels = spark.createDataFrame(
        [(f"key-{i}",) for i in range(0, 100)], "scan_key string"
    )
    filt = apply_cuckoo_delta(filt, dels, "scan_key", 4, 1024, op="delete")
    rows = filt.collect()
    filters = {
        int(r["shard"]): CuckooFilter.from_bytes(
            bytes(r["tbl"]), int(r["n_buckets"])
        )
        for r in rows
    }
    import zlib as _z

    def probe(k):
        return k in filters.get(_z.crc32(k.encode()) % 4, CuckooFilter(8))

    assert all(probe(f"key-{i}") for i in range(100, 400))
    assert sum(probe(f"key-{i}") for i in range(100)) < 5  # fp collisions only

    # the prefiltered anti-join equals the exact one on the live set
    live = spark.createDataFrame(
        [(f"key-{i}",) for i in range(100, 400)], "scan_key string"
    )
    cands = spark.createDataFrame(
        [(f"key-{i}",) for i in range(0, 500)], "scan_key string"
    )
    got = {
        r["scan_key"]
        for r in anti_join_seen_cuckoo(cands, live, "scan_key", rows, 4).collect()
    }
    assert got == {f"key-{i}" for i in range(100)} | {
        f"key-{i}" for i in range(400, 500)
    }


def test_bloom_shards_and_anti_join(spark):
    seen = spark.createDataFrame(
        [(f"key-{i}",) for i in range(500)], "scan_key string"
    )
    cands = spark.createDataFrame(
        [(f"key-{i}", i) for i in range(400, 900)], "scan_key string, v int"
    )
    shards = build_bloom_shards(seen, "scan_key", 4, 0.01)
    assert set(shards) <= {0, 1, 2, 3}

    exact = {
        r["scan_key"]
        for r in anti_join_seen(cands, seen, "scan_key", use_bloom=False).collect()
    }
    with_bloom = {
        r["scan_key"]
        for r in anti_join_seen(
            cands, seen, "scan_key", use_bloom=True, shards=4
        ).collect()
    }
    assert exact == with_bloom == {f"key-{i}" for i in range(500, 900)}

    # co-partitioned shard-join probe: same answer, nothing collected
    copart = {
        r["scan_key"]
        for r in anti_join_seen(
            cands, seen, "scan_key", use_bloom=True, shards=4, probe="copart"
        ).collect()
    }
    assert copart == exact


def test_bloom_batch_matches_scalar():
    bf1, bf2 = BloomFilter(500, 0.01), BloomFilter(500, 0.01)
    keys = [f"k/{i}" for i in range(500)]
    bf1.add_batch(keys)
    for k in keys:
        bf2.add(k)
    assert (bf1.bits == bf2.bits).all()
    probes = keys[:50] + [f"other/{i}" for i in range(50)]
    got = bf1.contains_batch(probes)
    assert [bool(b) for b in got] == [p in bf2 for p in probes]


def test_store_compaction(spark, tmp_path):
    from tspider_spark.sources.state import StateStore

    store = StateStore(spark, str(tmp_path / "c"))
    for w in range(4):
        store.commit(
            appends={
                "seen_scanned": spark.createDataFrame(
                    [(f"h{i % 3}.com", f"h{i % 3}.com/p/{w}-{i}") for i in range(20)],
                    "hostname string, scan_key string",
                )
            },
            meta={"next_depth": w},
        )
    before = sorted(map(tuple, store.read("seen_scanned").collect()))
    assert len(store.manifest()["tables"]["seen_scanned"]) == 4
    assert store.compact() == ["seen_scanned"]
    assert len(store.manifest()["tables"]["seen_scanned"]) == 1
    after = sorted(map(tuple, store.read("seen_scanned").collect()))
    assert before == after
    assert store.meta()["next_depth"] == 3  # meta untouched
    # idempotent: nothing left to compact
    assert store.compact() == []


def test_dedup_clusters_components(spark):
    from tspider_spark.operators.textdedup import dedup_clusters

    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # chain 0-1-2-3, pair 5-6, singletons 4 and 7
    pairs = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 2), (5, 6)], "ia long, ib long"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup_clusters(ids, pairs).collect()
    }
    assert got == {
        0: (0, True), 1: (0, False), 2: (0, False), 3: (0, False),
        4: (4, True), 5: (5, True), 6: (5, False), 7: (7, True),
    }


def test_sample_by_hash_deterministic_and_stratified(spark):
    from pyspark.sql import functions as F

    from tspider_spark.operators.curate import sample_by_hash

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(4000)],
        "doc_id long, lang string",
    )
    rates = {"en": 0.5, "de": 0.1}
    a = sample_by_hash(df, rates, stratum_col="lang")
    b = sample_by_hash(df, rates, stratum_col="lang")
    rows_a = sorted(r["doc_id"] for r in a.collect())
    assert rows_a == sorted(r["doc_id"] for r in b.collect())  # deterministic
    by_lang = {
        r["lang"]: r["n"]
        for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # 2000 docs per stratum; binomial 3-sigma bounds
    assert 900 < by_lang["en"] < 1100
    assert 130 < by_lang.get("de", 0) < 270
    # different salt -> different (but still deterministic) sample
    c = sample_by_hash(df, rates, stratum_col="lang", salt="other")
    assert sorted(r["doc_id"] for r in c.collect()) != rows_a


def test_winnow_shared_substring_guarantee(spark):
    from tspider_spark.operators.textdedup import winnow_fingerprints

    k, w = 8, 4
    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            (1, "PREFIX AAA " + shared + " SUFFIX BBB"),
            (2, "totally different lead-in text then " + shared),
            (3, "no overlap with anything else at all in this one honestly"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=k, window=w)
    rows = fps.collect()
    sets = {}
    for r in rows:
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    # winnowing guarantee: a shared substring of length >= k + w - 1
    # yields at least one shared fingerprint, regardless of position
    assert sets[1] & sets[2]
    # and the unrelated doc shares nothing with either
    assert not (sets[3] & sets[1]) and not (sets[3] & sets[2])


def test_copart_anti_join_code_regime_matches_plain(spark):
    """anti_join_seen_copart(code_col=...): partitioning/joining on
    the xxhash64(host) surrogate (host kept as an equi-key) must be a
    pure physical choice — identical surviving rows, plus the code
    column retained for exchange reuse downstream."""
    from pyspark.sql import functions as F

    from tspider_spark.operators.dedupe import anti_join_seen_copart

    cands = spark.createDataFrame(
        [(f"h{i % 5}.com", f"h{i % 5}.com//p/{i % 40}", i)
         for i in range(200)],
        "hostname string, scan_key string, task_rank long",
    )
    seen = spark.createDataFrame(
        [(f"h{i % 5}.com", f"h{i % 5}.com//p/{i}") for i in range(0, 40, 3)],
        "hostname string, scan_key string",
    )
    plain = anti_join_seen_copart(cands, seen, "scan_key", "hostname", 4)
    coded = anti_join_seen_copart(
        cands, seen, "scan_key", "hostname", 4, code_col="_hc"
    )
    assert "_hc" in coded.columns
    key = lambda r: (r["hostname"], r["scan_key"], r["task_rank"])
    assert sorted(map(key, plain.collect())) == sorted(
        map(key, coded.collect())
    )
    # the kept code is exactly xxhash64(hostname)
    chk = coded.filter(
        F.col("_hc") != F.xxhash64("hostname")
    ).count()
    assert chk == 0
