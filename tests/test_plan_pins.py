"""Plan pins for the lambda-binding fixes: higher-order-function
lambdas defeat codegen subexpression elimination, so the split /
normalize derivation must appear in the optimized plan EXACTLY ONCE
(bound column), not inlined per lambda element. These tests fail if
someone re-inlines the macro."""

from pyspark.sql import functions as F


def _opt_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _docs(spark):
    return spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "beta gamma delta epsilon")],
        "doc_id long, text string",
    )


def test_hashed_gram_features_splits_once(spark):
    from tspider_spark.operators.classify import hashed_gram_features

    plan = _opt_plan(hashed_gram_features(_docs(spark), n_buckets=64))
    assert plan.count("split(") == 1, plan


def test_shingles_splits_once(spark):
    from tspider_spark.operators.textdedup import shingles

    plan = _opt_plan(shingles(_docs(spark), n=3))
    assert plan.count("split(") == 1, plan


def test_winnow_normalizes_once(spark):
    from tspider_spark.operators.textdedup import winnow_fingerprints

    plan = _opt_plan(winnow_fingerprints(_docs(spark)))
    assert plan.count("regexp_replace(") == 1, plan


def test_substring_dedupe_never_slices_an_inline_split(spark):
    from tspider_spark.operators.quality import substring_dedupe

    plan = _opt_plan(substring_dedupe(_docs(spark), length=2))
    # occ is legitimately scanned twice (winner agg + dup join), each
    # with ONE bound split — but no gram lambda may slice an INLINED
    # split (the quadratic shape this pin guards against)
    assert "slice(split(" not in plan, plan
    assert "slice(_gw" in plan, plan


def test_wordpiece_vocab_join_is_broadcast(spark):
    from tspider_spark.operators.wordpiece import (
        corpus_words,
        wordpiece_encode_words,
        wordpiece_vocab,
    )

    words = corpus_words(_docs(spark))
    vocab = wordpiece_vocab(words, min_df=1)
    plan = _opt_plan(wordpiece_encode_words(words, vocab))
    assert "strategy=broadcast" in plan, plan
