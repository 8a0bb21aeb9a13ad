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


# ---------------------------------------------------------------------------
# UniMax water-filling


def _unimax(spark, counts, frac, cap=2):
    from tspider_spark.operators.curate import unimax_budgets

    df = spark.createDataFrame(counts, "lang string, n_tokens long")
    return {
        r["lang"]: r
        for r in unimax_budgets(df, budget_frac=frac, epoch_cap=cap).collect()
    }


def test_unimax_small_lang_capped_rest_even(spark):
    # tokens: a=10, b=100, c=100; B = 0.5*210 = 105
    # capacities (cap=2): a=20, b=200, c=200. a capped? 20*(3-1)=40 <=
    # 105-20=85 -> yes. remaining (105-20)=85 over 2 langs -> 42 each.
    out = _unimax(spark, [("a", 10), ("b", 100), ("c", 100)], 0.5)
    assert out["a"]["alloc_tokens"] == 20 and out["a"]["epochs"] == 2.0
    assert out["b"]["alloc_tokens"] == 42 and out["c"]["alloc_tokens"] == 42
    assert out["b"]["epochs"] == 0.42


def test_unimax_budget_exceeds_all_caps(spark):
    # B = 1.0 * 300 = 300 >= total capacity 2*300=600? No: B=300,
    # caps a=200,b=400. a: 200*(2-1)=200 <= 300-200=100? no ->
    # nothing capped -> even split floor(300/2)=150 each.
    out = _unimax(spark, [("a", 100), ("b", 200)], 1.0)
    assert out["a"]["alloc_tokens"] == 150 and out["b"]["alloc_tokens"] == 150
    # and with a huge budget every lang hits its epoch cap
    out = _unimax(spark, [("a", 100), ("b", 200)], 10.0)
    assert out["a"]["alloc_tokens"] == 200 and out["b"]["alloc_tokens"] == 400
    assert out["a"]["epochs"] == 2.0 and out["b"]["epochs"] == 2.0


def test_unimax_total_alloc_within_budget(spark):
    counts = [(f"l{i}", 50 * (i + 1)) for i in range(7)]
    out = _unimax(spark, counts, 0.4)
    total = sum(50 * (i + 1) for i in range(7))
    budget = int(0.4 * total)
    assert sum(r["alloc_tokens"] for r in out.values()) <= budget
    for r in out.values():
        assert r["alloc_tokens"] <= 2 * r["n_tokens"]


# ---------------------------------------------------------------------------
# exact-k sampling


def test_sample_exact_k_deterministic_and_sized(spark):
    from tspider_spark.operators.curate import sample_exact_k

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    a = sorted(r["doc_id"] for r in sample_exact_k(df, 50).collect())
    b = sorted(r["doc_id"] for r in sample_exact_k(df, 50).collect())
    assert len(a) == 50 and a == b
    # growing the corpus never evicts non-hash-order members: the
    # sample of a superset is the k smallest hashes of the superset
    big = spark.range(2000).select(F.col("id").alias("doc_id"))
    c = set(r["doc_id"] for r in sample_exact_k(big, 50).collect())
    assert len(c) == 50


def test_sample_exact_k_plan_is_take_ordered(spark):
    from tspider_spark.operators.curate import sample_exact_k

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    plan = (
        sample_exact_k(df, 10)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort


# ---------------------------------------------------------------------------
# multimodal token costs


def test_multimodal_token_costs(spark):
    from tspider_spark.operators.interleaved import multimodal_token_costs

    rows = [
        (1, [("text", "three word span", None), ("media", None, "img://a")]),
        (2, [("media", None, "img://a"), ("media", None, "img://b")]),
        (3, [("text", "one", None)]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id int, spans array<struct<kind string, text string, "
        "media_ref string>>",
    )
    out = {
        r["doc_id"]: r for r in multimodal_token_costs(df, 576).collect()
    }
    assert out[1]["n_text_tokens"] == 3 and out[1]["n_media"] == 1
    assert out[1]["mm_tokens"] == 3 + 576
    assert out[2]["mm_tokens"] == 2 * 576
    assert out[3]["mm_tokens"] == 1
