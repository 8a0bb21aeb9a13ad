"""PMI collocation mining: hand-checked math, pruning, tie-breaks,
and DuckDB oracle parity."""

from __future__ import annotations

import math

import duckdb

from tspider_spark.operators.textstats import pmi_collocations, pmi_oracle_sql


def _docs(spark, *texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_pmi_hand_checked(spark):
    # tokens: a b a b c -> pairs (a,b)x2 (b,a)x1 (b,c)x1; unigrams
    # a:2 b:2 c:1 (n_tok=5). min_count=2 keeps only (a,b), so the
    # surviving-pair denominator is 2.
    out = pmi_collocations(_docs(spark, "a b a b c"), min_count=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["w1"], r["w2"], r["n_pair"]) == ("a", "b", 2)
    expect = math.log((2 / 2) / ((2 / 5) * (2 / 5)))
    assert r["pmi"] == round(expect, 6)


def test_pmi_prunes_before_join_and_breaks_ties(spark):
    # (x,y) and (u,v) occur once each with identical unigram counts ->
    # identical pmi; tie-break must order (u,v) first
    out = pmi_collocations(
        _docs(spark, "x y", "u v"), min_count=1, top_k=10
    ).collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("u", "v"), ("x", "y")]
    assert out[0]["pmi"] == out[1]["pmi"]
    # min_count above all counts -> empty result, no crash
    assert pmi_collocations(_docs(spark, "x y"), min_count=2).count() == 0


def test_pmi_pairs_stay_within_docs(spark):
    # no cross-document adjacency: "a" | "b" yields no (a,b) pair
    out = pmi_collocations(_docs(spark, "a", "b"), min_count=1).collect()
    assert out == []


def test_pmi_oracle_parity(spark, tmp_path):
    texts = [
        "the fast data spark merge merge sort",
        "spark data the the fast merge",
        "sort merge join join spark",
    ]
    _docs(spark, *texts).write.parquet(str(tmp_path / "d"))
    docs = spark.read.parquet(str(tmp_path / "d"))
    got = sorted(map(tuple, pmi_collocations(docs, min_count=2).collect()))
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{tmp_path / 'd'}/*.parquet'"
    )
    exp = sorted(con.execute(pmi_oracle_sql(min_count=2)).fetchall())
    assert got == exp


# --- zipf_stats (same corpus-stats family) ----------------------------------


def test_zipf_slope_on_known_distribution(spark):
    import math

    from tspider_spark.operators.textstats import zipf_stats

    # exact freq ∝ 1/rank corpus: aa x12, bb x6, cc x4, dd x3 -> slope
    # of ln f on ln r over 4 points is exactly -1... (12/r rounding:
    # use true harmonic counts 12, 6, 4, 3 = 12/r exactly)
    words = ["aa"] * 12 + ["bb"] * 6 + ["cc"] * 4 + ["dd"] * 3
    out = zipf_stats(
        _docs(spark, " ".join(words)), top_n=4
    ).collect()[0]
    assert out["n_types"] == 4 and out["n_tokens"] == 25
    assert out["top_n"] == 4
    assert abs(out["zipf_slope"] - (-1.0)) < 1e-6
    assert abs(out["zipf_intercept"] - math.log(12.0)) < 1e-6


def test_zipf_rank_tie_break_is_total(spark):
    from tspider_spark.operators.textstats import zipf_stats

    # all words equally frequent: slope exactly 0, intercept ln(2)
    out = zipf_stats(_docs(spark, "pp qq rr pp qq rr"), top_n=3).collect()[0]
    assert out["zipf_slope"] == 0.0


# --- corpus_drift -----------------------------------------------------------


def test_drift_identical_slices_is_flat(spark):
    from tspider_spark.operators.textstats import corpus_drift

    d = _docs(spark, "aa bb cc", "dd ee aa")
    out = corpus_drift(d, d, top_k=10).collect()
    # identical distributions: every contribution is exactly 0
    assert len(out) == 5
    assert all(r["contrib"] == 0.0 for r in out)
    assert all(r["p_old"] == r["p_new"] for r in out)


def test_drift_surfaces_the_shifted_word(spark):
    from tspider_spark.operators.textstats import corpus_drift

    old = _docs(spark, "base base base common")
    new = _docs(spark, "novel novel novel common")
    out = corpus_drift(old, new, top_k=2).collect()
    # the two one-sided words dominate; 'common' (shared) does not
    top_words = {r["w"] for r in out}
    assert top_words == {"base", "novel"}
    assert all(r["contrib"] > 0 for r in out)
    # one-sided words still get a smoothed nonzero probability
    base = [r for r in out if r["w"] == "base"][0]
    assert base["n_new"] == 0 and base["p_new"] > 0
