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


def test_suffix_array_has_no_empty_partition_window(spark):
    # r3 verdict finding #2: corpus_positions' constant stratum used
    # to constant-fold the cumsum's stage-2 partition key into an
    # empty WindowExec spec (a single-partition window over the
    # per-bucket totals — 10^7+ rows on one partition at production
    # scale). The three-level cumsum must leave NO window with an
    # empty partition spec anywhere in the suffix-array plan.
    import re

    from tspider_spark.operators.suffixarray import suffix_array

    docs = spark.createDataFrame(
        [(f"doc{i:03d}", "repeated words repeated words") for i in range(8)],
        "doc_id string, text string",
    )
    plan = _opt_plan(suffix_array(docs, top_k=10))
    empty = re.findall(r"Window \[[^\]]*\], \[\]", plan)
    assert not empty, plan


def test_stratum_cumsum_no_empty_partition_window_any_stratum(spark):
    import re

    from tspider_spark.operators.curate import _exclusive_stratum_cumsum

    df = spark.createDataFrame(
        [(f"id{i:04d}", 0, i % 7) for i in range(32)],
        "doc_id string, _one int, n_tokens int",
    )
    plan = _opt_plan(
        _exclusive_stratum_cumsum(df, "_one", "doc_id", "n_tokens", 4)
    )
    assert not re.findall(r"Window \[[^\]]*\], \[\]", plan), plan


def test_no_empty_partition_window_across_contract_surface(spark):
    # Repo-wide version of the suffix-array pin: NO query in the
    # whole 147-query contract surface may plan a Window node with an
    # empty partition spec (the single-partition WindowExec that
    # cannot scale past one executor). Plans only — nothing executes.
    import re

    import __spark_entry__ as entry

    flagged = {}
    for name, fn in entry.queries().items():
        plan = _opt_plan(fn(spark, "/root/testdata/sf0.001"))
        n = len(re.findall(r"Window \[[^\]]*\], \[\]", plan))
        if n:
            flagged[name] = n
    assert not flagged, flagged


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
