"""AIMD adaptive politeness: hand-walked folds, clamping, wave
ordering, and oracle parity."""

from __future__ import annotations

import duckdb

from tspider_spark.operators.recrawl import aimd_concurrency, aimd_oracle_sql


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "hostname string, wave int, is_err int"
    )


def test_hand_walked_fold(spark):
    # h: waves 0..3 = good, good, bad, good
    # c: 1 -> 2 -> 3 -> max(1, 1.5) -> 2.5
    rows = [("h", 0, 0), ("h", 1, 0), ("h", 2, 1), ("h", 3, 0)]
    out = aimd_concurrency(_log(spark, rows)).collect()[0]
    assert (out["n_waves"], out["final_concurrency"]) == (4, 2.5)


def test_clamps_floor_and_ceiling(spark):
    # all-bad history floors at 1; all-good caps at c_max
    bad = [("b", w, 1) for w in range(10)]
    good = [("g", w, 0) for w in range(10)]
    out = {
        r["hostname"]: r["final_concurrency"]
        for r in aimd_concurrency(_log(spark, bad + good), c_max=4.0).collect()
    }
    assert out["b"] == 1.0
    assert out["g"] == 4.0


def test_wave_order_not_input_order(spark):
    # same multiset of outcomes, different arrival order: the fold
    # must follow wave order (bad at wave 0 vs bad at wave 3 differ)
    early = [("e", 0, 1), ("e", 1, 0), ("e", 2, 0), ("e", 3, 0)]
    late = [("l", 3, 1), ("l", 0, 0), ("l", 1, 0), ("l", 2, 0)]
    out = {
        r["hostname"]: r["final_concurrency"]
        for r in aimd_concurrency(_log(spark, early + late)).collect()
    }
    # e: 1 ->(bad) 1 -> 2 -> 3 -> 4 ; l: 1 -> 2 -> 3 -> 4 ->(bad) 2
    assert out["e"] == 4.0 and out["l"] == 2.0


def test_err_rate_threshold_within_wave(spark):
    # wave err rate 1/3 > 0.3 -> bad; 1/4 <= 0.3 -> good
    rows = [("h", 0, 1), ("h", 0, 0), ("h", 0, 0),
            ("g", 0, 1), ("g", 0, 0), ("g", 0, 0), ("g", 0, 0)]
    out = {
        r["hostname"]: r["final_concurrency"]
        for r in aimd_concurrency(_log(spark, rows)).collect()
    }
    assert out["h"] == 1.0 and out["g"] == 2.0


def test_oracle_parity(spark, tmp_path):
    rows = [
        (f"h{i % 5}", w, int((i * 7 + w * 3) % 4 == 0))
        for i in range(40)
        for w in range(5)
    ]
    _log(spark, rows).write.parquet(str(tmp_path / "l"))
    log = spark.read.parquet(str(tmp_path / "l"))
    got = sorted(map(tuple, aimd_concurrency(log).collect()))
    con = duckdb.connect()
    sql = aimd_oracle_sql(
        f"log as (select hostname, wave, is_err from '{tmp_path / 'l'}/*.parquet')"
    )
    assert got == sorted(con.execute(sql).fetchall())


# --- bloom_fpr_eval (seen-set sizing harness) -------------------------------


def test_bloom_fpr_no_false_negatives_by_construction(spark):
    from tspider_spark.operators.dedupe import bloom_fpr_eval

    seen = spark.createDataFrame(
        [(f"k{i}",) for i in range(200)], "scan_key string"
    )
    # probe = the seen set itself: everything is excluded as a true
    # positive, so n_probe = 0 and fpr is null (not a crash)
    r = bloom_fpr_eval(seen, seen, m=1 << 12, k=3).collect()[0]
    assert r["n_seen"] == 200 and r["n_probe"] == 0
    assert r["n_fp"] == 0 and r["fpr"] is None


def test_bloom_fpr_tracks_theory(spark):
    from tspider_spark.operators.dedupe import bloom_fpr_eval

    seen = spark.createDataFrame(
        [(f"k{i}",) for i in range(2000)], "scan_key string"
    )
    probe = spark.createDataFrame(
        [(f"p{i}",) for i in range(2000)], "scan_key string"
    )
    r = bloom_fpr_eval(seen, probe, m=1 << 13, k=2).collect()[0]
    # fill ratio ~ 2000*2/8192 -> theory fpr ~ 0.17; measured within 3x
    assert r["bits_set"] <= 4000
    assert 0.0 <= r["fpr"] <= 1.0
    assert abs(r["fpr"] - r["fpr_theory"]) < 0.1


def test_bloom_fpr_oracle_parity(spark, tmp_path):
    from tspider_spark.operators.dedupe import (
        bloom_fpr_eval,
        bloom_fpr_oracle_sql,
    )

    spark.createDataFrame(
        [(f"s{i}",) for i in range(500)], "scan_key string"
    ).write.parquet(str(tmp_path / "s"))
    spark.createDataFrame(
        [(f"q{i}",) for i in range(500)] + [("s1",), ("s2",)],
        "scan_key string",
    ).write.parquet(str(tmp_path / "q"))
    seen = spark.read.parquet(str(tmp_path / "s"))
    probe = spark.read.parquet(str(tmp_path / "q"))
    got = [tuple(r) for r in bloom_fpr_eval(seen, probe, m=4096, k=3).collect()]
    con = duckdb.connect()
    sql = bloom_fpr_oracle_sql(
        f"seen as (select scan_key from '{tmp_path / 's'}/*.parquet')",
        f"probe as (select scan_key from '{tmp_path / 'q'}/*.parquet')",
        m=4096, k=3,
    )
    assert got == con.execute(sql).fetchall()
