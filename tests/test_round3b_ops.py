"""Late-round-3 operators: content-defined chunking dedupe, SoftDeDup
reweighting, and distributed curriculum ordering."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tspider_spark.operators.curate import curriculum_order
from tspider_spark.operators.textdedup import cdc_chunk_stats, soft_dedup_weights


# deterministic varied text long enough to contain several content-
# defined cut points at mask_bits=6 (expected chunk ~64 chars)
_LONG = " ".join(f"token{i}alpha beta{i} gamma{i}delta" for i in range(40))
_OTHER = " ".join(f"zebra{i}xylo quux{i} corge{i}grault" for i in range(40))


@pytest.fixture(scope="module")
def cdc_docs(spark):
    rows = [
        (1, _LONG),  # original
        (2, _LONG),  # exact copy -> full dup coverage both ways
        (3, "completely unique short text with no twin"),
        (4, "PREFIX INSERTED HERE " + _LONG),  # insertion-shifted copy
        (5, _OTHER),  # long but unshared
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_cdc_exact_copy_full_coverage(spark, cdc_docs):
    out = {
        r["doc_id"]: r
        for r in cdc_chunk_stats(cdc_docs, k=8, mask_bits=6).collect()
    }
    # exact copies: every chunk is shared -> ratio 1.0
    assert out[1]["dup_ratio"] == 1.0
    assert out[2]["dup_ratio"] == 1.0
    assert out[1]["n_chunks"] == out[2]["n_chunks"]
    # unshared docs: nothing duplicated
    assert out[3]["dup_ratio"] == 0.0
    assert out[5]["dup_ratio"] == 0.0
    assert out[5]["dup_chunks"] == 0


def test_cdc_insertion_robust(spark, cdc_docs):
    """The point of CDC over fixed-size blocks: a prefix insertion
    only disturbs chunks up to the first content-defined cut point
    inside the shared region — the rest realign and dedupe."""
    out = {
        r["doc_id"]: r
        for r in cdc_chunk_stats(cdc_docs, k=8, mask_bits=6).collect()
    }
    assert out[4]["dup_chunks"] >= 1
    assert 0.0 < out[4]["dup_ratio"] <= 1.0


def test_cdc_chunks_partition_text(spark, cdc_docs):
    """Chunks exactly tile the normalized text: per-doc byte total ==
    normalized length (no gaps, no overlaps)."""
    out = cdc_chunk_stats(cdc_docs, k=8, mask_bits=6)
    norm = cdc_docs.select(
        "doc_id",
        F.length(
            F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
        ).alias("nlen"),
    )
    bad = (
        out.join(norm, "doc_id")
        .filter(F.col("total_bytes") != F.col("nlen"))
        .count()
    )
    assert bad == 0


def test_soft_dedup_weights_component_sizes(spark):
    ids = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id int")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "ia int, ib int"
    )
    out = {r["doc_id"]: r for r in soft_dedup_weights(ids, pairs).collect()}
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == out[3]["cluster_id"] == 1
    for d in (1, 2, 3):
        assert out[d]["commonness"] == 3
        assert out[d]["weight"] == round(1 / 3, 6)
    for d in (4, 5):
        assert out[d]["commonness"] == 1
        assert out[d]["weight"] == 1.0
    # expected-count preservation on duplicated groups: weights of a
    # component sum to ~1
    assert abs(sum(out[d]["weight"] for d in (1, 2, 3)) - 1.0) < 1e-4


def test_curriculum_order_matches_single_window(spark):
    rows = [(i, (i * 7) % 13) for i in range(200)]  # heavy key ties
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = curriculum_order(df, "n_tokens").select(
        "doc_id", "curriculum_rank"
    )
    want = df.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy("n_tokens", "doc_id"))
        .cast("long")
        .alias("curriculum_rank"),
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_curriculum_order_plan_has_no_global_window(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("n_tokens")
    )
    plan = (
        curriculum_order(df, "n_tokens")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every Window in the plan must be partitioned (no single-partition
    # global sort-rank)
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "n_tokens" in line  # partition spec present
