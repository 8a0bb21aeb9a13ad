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


def test_copart_anti_join_adds_no_stacked_exchange(spark):
    # r4 plan audit: the old shape pre-repartitioned both sides on
    # host and hinted shuffle_hash; Spark 4.1 shuffled joins refuse
    # subset co-partitioning, so the join re-exchanged both sides on
    # (host, key) ON TOP of the user host exchange — measured +45%
    # shuffled bytes per wave (2764 vs 1907 MB at 24M candidates).
    # New shape leaves exchanges to the planner; this pin asserts no
    # user REPARTITION exchange is ever stacked under the join in
    # either regime.
    import re

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from tspider_spark.operators.dedupe import anti_join_seen_copart
    from tspider_spark.operators.schedule import admit_wave
    from tspider_spark.sources.state import empty_df

    cands = spark.createDataFrame(
        [(f"h{i % 5}", f"h{i % 5}//p/{i}", f"u{i}", i, 0, 1)
         for i in range(50)],
        "hostname string, scan_key string, url string, "
        "task_rank long, seq int, synth_rank int",
    )
    seen = spark.createDataFrame(
        [(f"h{i % 5}", f"h{i % 5}//p/{i * 3}") for i in range(10)],
        "hostname string, scan_key string",
    )
    budget = empty_df(spark, StructType([
        StructField("hostname", StringType()),
        StructField("reqcount", LongType()),
    ]))

    def exchanges():
        adm = admit_wave(
            anti_join_seen_copart(cands, seen, "scan_key", "hostname", 4),
            budget, 100, reduce_first=False,
        )
        adm.collect()  # materialize THIS dataset so AQE finalizes its plan
        plan = adm._jdf.queryExecution().executedPlan().toString()
        # an AdaptiveSparkPlan prints Final AND Initial sections —
        # pin only what actually ran
        final = plan.split("Initial Plan")[0]
        return re.findall(
            r"Exchange hashpartitioning\(([^)]*)\), (\w+)", final
        ), final

    # the core invariant in any regime: no user REPARTITION exchange
    # is stacked under the join's own requirement — every exchange is
    # planner-placed (ENSURE_REQUIREMENTS), and the candidate stream
    # is never exchanged on (host, key) more than once
    exs, final = exchanges()
    kinds = [k for _, k in exs]
    assert kinds.count("REPARTITION_BY_NUM") == 0, exs
    assert sum("scan_key" in c for c, _ in exs) <= 2, exs

    # big-seen regime (broadcast disabled): sort-merge join with one
    # (host, key) exchange per side, still zero stacked repartitions
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        exs, final = exchanges()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in final and "LeftAnti" in final, final
    kinds = [k for _, k in exs]
    assert kinds.count("REPARTITION_BY_NUM") == 0, exs
    assert sum("scan_key" in c for c, _ in exs) == 2, exs


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
