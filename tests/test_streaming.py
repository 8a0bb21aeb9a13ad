"""Structured Streaming operators: watermark dedupe, windowed host
rates, and the foreachBatch bridge into the batch admission fold."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from tspider_spark.config import CrawlConfig
from tspider_spark.sources.state import SCHEMAS, StateStore
from tspider_spark.streaming.stream import (
    run_foreach_batch_crawl_step,
    stream_candidate_dedupe,
    stream_host_rate,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)

CAND_SCHEMA = (
    "event_time timestamp, hostname string, scan_key string, url string, "
    "task_rank long, seq int, synth_rank int"
)


def _write_candidates(spark, path, sentinel: bool = False):
    rows = []
    for i in range(50):
        host = f"h{i % 5}.com"
        key = f"{host}//p/{i % 20}"  # dups across i
        rows.append(
            (T0 + timedelta(seconds=i), host, key, f"http://{key}", i, 0, 1)
        )
    if sentinel:
        # a far-future row advances the watermark so earlier
        # event-time windows finalize and emit in append mode
        rows.append(
            (T0 + timedelta(hours=2), "zz.com", "zz.com//s", "http://zz.com/s", 999, 0, 1)
        )
    spark.createDataFrame(rows, CAND_SCHEMA).write.mode("overwrite").parquet(path)
    return rows


def test_stream_dedupe_and_rate(spark, tmp_path):
    src = str(tmp_path / "cands")
    _write_candidates(spark, src, sentinel=True)
    stream = spark.readStream.schema(CAND_SCHEMA).parquet(src)

    out1 = str(tmp_path / "dedup_out")
    q1 = (
        stream_candidate_dedupe(stream)
        .writeStream.format("parquet")
        .option("path", out1)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(120)
    deduped = spark.read.parquet(out1)
    assert deduped.count() == 21  # 20 distinct scan keys + sentinel
    assert deduped.select("scan_key").distinct().count() == 21

    out2 = str(tmp_path / "rate_out")
    q2 = (
        stream_host_rate(stream, window="1 minute")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out2)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rates = {
        (r["hostname"]): r["n_urls"]
        for r in spark.read.parquet(out2).collect()
        if r["hostname"] != "zz.com"  # sentinel window never finalizes
    }
    assert sum(rates.values()) == 50 and len(rates) == 5


def test_foreach_batch_bridge(spark, tmp_path):
    src = str(tmp_path / "cands2")
    _write_candidates(spark, src)
    store = StateStore(spark, str(tmp_path / "stream_state"))
    store.commit(replaces={
        "host_budget": spark.createDataFrame([], SCHEMAS["host_budget"]),
    })
    cfg = CrawlConfig(max_per_host=2)

    stream = (
        spark.readStream.schema(CAND_SCHEMA)
        .parquet(src)
        .drop("event_time")
    )
    q = run_foreach_batch_crawl_step(stream, store, cfg, str(tmp_path / "ck3"))
    q.awaitTermination(120)

    budget = {r["hostname"]: r["reqcount"] for r in store.read("host_budget").collect()}
    # cap=2 with strict '>' semantics => at most 3 per host
    assert budget and all(v <= 3 for v in budget.values())
    seen = store.read("seen_scanned").count()
    assert seen == sum(budget.values())


def test_user_sessions_gap_semantics(spark):
    import datetime as dt

    from tspider_spark.streaming.stream import user_sessions

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: events at 0, 10, 25 -> one session (gaps < 30);
        # then 60 -> new session (gap 35 >= 30)
        (1, ts(0), 1.0), (1, ts(10), 2.0), (1, ts(25), 3.0), (1, ts(60), 4.0),
        # user 2: an exactly-30-min gap still MERGES (inclusive end);
        # 31 min later -> new session
        (2, ts(0), 5.0), (2, ts(30), 6.0), (2, ts(61), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in user_sessions(df).collect()
    }
    assert got == {
        (1, ts(0)): (3, 6.0),
        (1, ts(60)): (1, 4.0),
        (2, ts(0)): (2, 11.0),
        (2, ts(61)): (1, 7.0),
    }


def test_stream_budget_admission_state_across_batches(spark, tmp_path):
    """applyInPandasWithState budget: admitted keys + budget survive
    across micro-batches (file stream, one file per trigger)."""
    import time

    from tspider_spark.streaming.stream import stream_budget_admission

    src = tmp_path / "cands"
    src.mkdir()
    b1 = spark.createDataFrame(
        [("a.com", "a.com/k1", "http://a.com/k1"),
         ("a.com", "a.com/k2", "http://a.com/k2")],
        "hostname string, scan_key string, url string",
    )
    b1.coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))
    time.sleep(1.1)  # distinct mtimes -> deterministic trigger order
    b2 = spark.createDataFrame(
        [("a.com", "a.com/k2", "http://a.com/k2-dup"),
         ("a.com", "a.com/k3", "http://a.com/k3"),
         ("a.com", "a.com/k4", "http://a.com/k4")],
        "hostname string, scan_key string, url string",
    )
    b2.coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema("hostname string, scan_key string, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    admitted = stream_budget_admission(stream, max_per_host=2)
    q = (
        admitted.writeStream.format("memory")
        .queryName("budget_adm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["scan_key"] for r in spark.sql("select * from budget_adm").collect()}
    # cap=2 -> strict '>' admits cap+1=3 keys; k2's duplicate is
    # state-deduped across batches; k4 exceeds the carried budget
    assert got == {"a.com/k1", "a.com/k2", "a.com/k3"}


def test_foreach_batch_incremental_dedupe(spark, tmp_path):
    from tspider_spark.streaming.stream import (
        run_foreach_batch_incremental_dedupe,
    )

    texts = {
        "A": "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "B": "one two three four five six seven eight nine ten",
        "C": "red orange yellow green blue indigo violet pink brown black",
    }
    store = StateStore(spark, str(tmp_path / "dedup_state"))

    # batch 1: A, B, and an in-batch copy of A
    b1 = str(tmp_path / "b1")
    spark.createDataFrame(
        [(1, texts["A"]), (2, texts["B"]), (3, texts["A"])],
        "doc_id long, text string",
    ).write.parquet(b1)
    q = run_foreach_batch_incremental_dedupe(
        spark.readStream.schema("doc_id long, text string").parquet(b1),
        store, str(tmp_path / "ck_d1"),
    )
    q.awaitTermination(120)
    kept1 = {r.doc_id for r in store.read("dedup_docs").collect()}
    assert kept1 == {1, 2}  # in-batch copy dropped, keep-first

    # batch 2 (separate stream, same store): a cross-batch copy of A
    # (must be caught via the persisted index), a fresh C, and an
    # in-batch copy of C
    b2 = str(tmp_path / "b2")
    spark.createDataFrame(
        [(10, texts["A"]), (11, texts["C"]), (12, texts["C"])],
        "doc_id long, text string",
    ).write.parquet(b2)
    q = run_foreach_batch_incremental_dedupe(
        spark.readStream.schema("doc_id long, text string").parquet(b2),
        store, str(tmp_path / "ck_d2"),
    )
    q.awaitTermination(120)
    kept2 = {r.doc_id for r in store.read("dedup_docs").collect()}
    assert kept2 == {1, 2, 11}

    # the index covers exactly the surviving docs
    idx_docs = {r.doc_id for r in store.read("band_index").collect()}
    assert idx_docs == kept2


def test_foreach_batch_sketch_merge_equals_batch_sketch(spark, tmp_path):
    """Streaming HLL maintenance: after draining N micro-batches, the
    persisted register table must EQUAL the from-scratch batch sketch
    of the union (HLL merge is exact on registers, not approximate),
    state stays <= 2^b rows per host, and snapshots time-travel."""
    from tspider_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from tspider_spark.sources.state import StateStore
    from tspider_spark.streaming.stream import run_foreach_batch_sketch_merge

    src = str(tmp_path / "urls")
    rows = [
        ("big.com", f"http://big.com/p{i}") for i in range(60)
    ] + [("tiny.com", "http://tiny.com/a"), ("tiny.com", "http://tiny.com/b")]
    # three files -> availableNow drains them as separate micro-batches
    # (maxFilesPerTrigger=1)
    for part in range(3):
        spark.createDataFrame(
            rows[part::3], "hostname string, url string"
        ).coalesce(1).write.mode("append").parquet(src)

    store = StateStore(spark, str(tmp_path / "state"))
    stream = (
        spark.readStream.schema("hostname string, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_foreach_batch_sketch_merge(
        stream, store, str(tmp_path / "ck"), b=5
    )
    q.awaitTermination(120)

    merged = store.read("host_hll")
    batch = hll_registers(
        spark.createDataFrame(rows, "hostname string, url string"),
        "hostname", "url", b=5,
    ).select(F.col("grp").alias("hostname"), "reg", "rho")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # bounded state: at most m = 32 registers per host
    per_host = merged.groupBy("hostname").count().collect()
    assert all(r["count"] <= 32 for r in per_host)
    # estimates finalize identically from the streamed registers
    ests = {
        r["hostname"]: r["n_hll"]
        for r in hll_estimate(merged, b=5).collect()
    }
    assert 40 <= ests["big.com"] <= 90
    assert 1 <= ests["tiny.com"] <= 4
    # one snapshot per micro-batch: an earlier version has fewer or
    # equally-advanced registers (time-travel reads work)
    assert store.version >= 3
    v1 = store.read("host_hll", version=1)
    assert v1.count() <= merged.count()


def test_foreach_batch_cms_merge_equals_batch_sketch(spark, tmp_path):
    """Streaming CMS maintenance: sum-merged counters across
    micro-batches equal the from-scratch batch sketch exactly, state
    is bounded by d*w, and top-k estimates read correctly."""
    from tspider_spark.operators.sketch import cms_table
    from tspider_spark.sources.state import StateStore
    from tspider_spark.streaming.stream import run_foreach_batch_cms_merge

    src = str(tmp_path / "urls")
    rows = [(f"http://h.com/hot",)] * 30 + [
        (f"http://h.com/p{i}",) for i in range(30)
    ]
    for part in range(3):
        spark.createDataFrame(rows[part::3], "url string").coalesce(
            1
        ).write.mode("append").parquet(src)

    store = StateStore(spark, str(tmp_path / "state"))
    stream = (
        spark.readStream.schema("url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_foreach_batch_cms_merge(
        stream, store, str(tmp_path / "ck"), d=3, w=64
    )
    q.awaitTermination(120)

    merged = store.read("cms_state")
    batch = cms_table(
        spark.createDataFrame(rows, "url string"), "url", d=3, w=64
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, batch.collect())
    )
    assert merged.count() <= 3 * 64
    # the sketch never undercounts the hot item
    import pyspark.sql.functions as F

    probes = merged.groupBy("row").agg(F.max("cnt").alias("mx"))
    assert all(r["mx"] >= 30 for r in probes.collect())
    assert store.version >= 3
