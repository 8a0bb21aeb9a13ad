"""lsh_recall_eval: the measured recall/precision of an LSH config
against exact ground truth."""

from __future__ import annotations

from tspider_spark.operators.textdedup import lsh_recall_eval


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_perfect_config_on_exact_dups(spark):
    # two identical docs + one unrelated: 1 true pair; identical docs
    # share every band -> candidate; recall = precision = 1
    base = "one two three four five six seven eight"
    out = lsh_recall_eval(
        _docs(spark, [base, base, "alpha beta gamma delta epsilon zeta eta theta"]),
        n=3, tau=0.9, k=32, bands=16, rows=2,
    ).collect()[0]
    assert (out["n_true"], out["n_hit"]) == (1, 1)
    assert out["recall"] == 1.0
    assert out["n_cand"] >= 1 and out["cand_precision"] <= 1.0


def test_no_dups_yields_null_recall_not_crash(spark):
    out = lsh_recall_eval(
        _docs(spark, ["aa bb cc dd ee", "vv ww xx yy zz"]),
        n=3, tau=0.9,
    ).collect()[0]
    assert out["n_true"] == 0 and out["n_hit"] == 0
    assert out["recall"] is None  # 0/0 reported as null, not a crash


def test_hit_never_exceeds_either_side(spark):
    # mixed corpus: dups, near-dups, unrelated
    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy cat today",
        "completely different text with other words entirely here now",
    ]
    out = lsh_recall_eval(_docs(spark, texts), n=3, tau=0.5).collect()[0]
    assert out["n_hit"] <= out["n_true"]
    assert out["n_hit"] <= out["n_cand"]
    assert 0.0 <= out["recall"] <= 1.0
