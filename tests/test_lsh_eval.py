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


# --- classifier calibration (same eval-harness family) ----------------------


def test_calibration_bins_partition_and_rates(spark):
    from pyspark.sql import functions as F

    from tspider_spark.operators.classify import (
        classifier_calibration,
        hashed_gram_features,
    )

    docs = spark.createDataFrame(
        [(i, ("good text here " if i % 2 else "bad junk words ") * 3)
         for i in range(40)],
        "doc_id long, text string",
    )
    feats = hashed_gram_features(docs, n_buckets=64)
    labels = docs.select(
        "doc_id", F.when(F.col("doc_id") % 2 == 1, 1.0).otherwise(0.0).alias("y")
    )
    # hand weights: zero -> every doc scores p = 0.5 -> single bin 5
    w0 = spark.createDataFrame(
        [(b, 0.0) for b in range(64)], "bucket int, weight double"
    )
    out = classifier_calibration(feats, labels, w0, bins=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bin"] == 5 and r["p_lo"] == 0.5 and r["p_hi"] == 0.6
    assert r["n"] == 40 and r["n_pos"] == 20
    assert r["mean_p"] == 0.5 and r["frac_pos"] == 0.5


def test_calibration_bin_edges_clamp_to_last_bin(spark):
    from pyspark.sql import functions as F

    from tspider_spark.operators.classify import (
        classifier_calibration,
        hashed_gram_features,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd")], "doc_id long, text string"
    )
    feats = hashed_gram_features(docs, n_buckets=8)
    labels = docs.select("doc_id", F.lit(1.0).alias("y"))
    # huge positive weights -> p rounds to 1.0, which must land in bin
    # bins-1, not a phantom bin `bins`
    w = spark.createDataFrame(
        [(b, 50.0) for b in range(8)], "bucket int, weight double"
    )
    out = classifier_calibration(feats, labels, w, bins=10).collect()
    assert len(out) == 1 and out[0]["bin"] == 9
    assert out[0]["p_hi"] == 1.0


# --- fairness_index ----------------------------------------------------------


def test_jain_fairness_extremes(spark):
    from tspider_spark.operators.diagnose import fairness_index

    # perfectly even: 3 hosts x 4 rows -> J = 1, max_share = 1/3
    even = spark.createDataFrame(
        [(f"h{i % 3}",) for i in range(12)], "hostname string"
    )
    r = fairness_index(even).collect()[0]
    assert (r["n_keys"], r["total"]) == (3, 12)
    assert r["jain"] == 1.0 and abs(r["max_share"] - 1 / 3) < 1e-12

    # one host dominates: x = (9, 1, 1, 1) -> J = 144/(4*84)
    skew = spark.createDataFrame(
        [("big",)] * 9 + [("a",), ("b",), ("c",)], "hostname string"
    )
    r = fairness_index(skew).collect()[0]
    assert r["jain"] == 144 / (4 * 84)
    assert r["max_share"] == 0.75


def test_matryoshka_overlap_full_dim_is_one_and_monotone_grid(spark):
    import numpy as np
    from tspider_spark.operators.similarity import matryoshka_overlap

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["dim"]: r for r in
           matryoshka_overlap(df, n_queries=5, dims=(16, 8, 4), k=5).collect()}
    assert set(out) == {16, 8, 4}
    assert out[16]["mean_overlap"] == 1.0 and out[16]["min_overlap"] == 1.0
    # overlaps live on the exact m/k grid
    for d in (8, 4):
        for fld in ("mean_overlap", "min_overlap"):
            v = out[d][fld]
            assert 0.0 <= v <= 1.0
        assert round(out[d]["min_overlap"] * 5, 6) == int(
            round(out[d]["min_overlap"] * 5)
        )
    # truncating to 4 of 16 random dims must lose SOME neighbors
    assert out[4]["mean_overlap"] < 1.0
