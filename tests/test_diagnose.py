"""skew diagnostics: hot keys, partition histogram, salt recommendation."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tspider_spark.operators.diagnose import (
    hot_keys,
    partition_histogram,
    skew_summary,
)


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [("hot",)] * 60 + [(k,) for k in "abcdefghij" for _ in range(4)]
    return spark.createDataFrame(rows, ["host"])


def test_hot_keys(spark, skewed):
    got = hot_keys(skewed, "host", k=3).collect()
    assert [r.rank for r in got] == [1, 2, 3]
    assert got[0].host == "hot" and got[0].cnt == 60
    assert got[0].share == 0.6
    assert got[1].host == "a" and got[1].cnt == 4  # ties break by key


def test_partition_histogram_conserves(spark, skewed):
    hist = partition_histogram(skewed, "host", width=4).collect()
    assert sum(r.rows for r in hist) == 100
    assert sum(r.n_keys for r in hist) == 11
    hot_bucket = int(hashlib.md5(b"hot").hexdigest()[:15], 16) % 4
    by_bucket = {r.bucket: r for r in hist}
    assert by_bucket[hot_bucket].rows >= 60


def test_skew_summary(spark, skewed):
    s = skew_summary(skewed, "host", width=4).collect()[0]
    assert (s.total_rows, s.n_keys, s.max_key_rows) == (100, 11, 60)
    assert s.max_key_share == 0.6
    # hottest key needs ceil(60 / (100/4)) = 3-way salting
    assert s.recommended_salt == 3
    assert s.max_bucket_rows >= 60
    assert s.bucket_imbalance >= 1.0


def test_uniform_needs_no_salt(spark):
    df = spark.range(1000).select(
        F.concat(F.lit("h"), (F.col("id") % 100).cast("string")).alias("host")
    )
    s = skew_summary(df, "host", width=4).collect()[0]
    assert s.recommended_salt == 1


def test_tool_runs(spark, tmp_path, skewed):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import skew_report

    p = str(tmp_path / "frontier")
    skewed.write.parquet(p)
    s = skew_report.main([p, "host", "--width", "4", "--top", "3"], spark=spark)
    assert s.recommended_salt == 3
