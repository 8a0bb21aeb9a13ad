"""Round-3c operators: char-entropy quality signals, provenance-level
quality rollup, fuzzy cross-corpus decontamination, temperature
sampling rates."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tspider_spark.operators.curate import temperature_rates
from tspider_spark.operators.quality import fuzzy_decontam, source_quality_rollup
from tspider_spark.operators.textstats import char_entropy_stats


# --- char_entropy_stats ----------------------------------------------------


def test_char_entropy_uniform_vs_degenerate(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "aaaa"), (3, "aabb"), (4, "")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy_stats(df).collect()}
    # 4 distinct chars, uniform -> 2 bits; single char -> 0 bits
    assert out[1]["entropy_bits"] == 2.0
    assert out[1]["top_char_frac"] == 0.25
    assert out[2]["entropy_bits"] == 0.0
    assert out[2]["top_char_frac"] == 1.0
    assert out[3]["entropy_bits"] == 1.0
    # empty doc contributes no rows (no chars to profile)
    assert 4 not in out
    assert out[1]["n_chars"] == 4 and out[1]["n_unique_chars"] == 4


def test_char_entropy_matches_direct_formula(spark):
    text = "mississippi river"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    row = char_entropy_stats(df).collect()[0]
    n = len(text)
    counts = {c: text.count(c) for c in set(text)}
    h = round(
        -sum((c / n) * math.log2(c / n) for c in counts.values()), 6
    )
    assert row["entropy_bits"] == pytest.approx(h, abs=1e-6)
    assert row["n_unique_chars"] == len(counts)
    assert row["top_char_frac"] == pytest.approx(
        max(counts.values()) / n, abs=1e-6
    )


# --- source_quality_rollup -------------------------------------------------


@pytest.fixture(scope="module")
def prov_docs(spark):
    good = "the cat and the dog of the house is to be seen and heard today"
    bad = "x" * 500  # one giant token: fails every quality band
    rows = (
        [(i, good, "srcA", "en") for i in range(30)]
        + [(100 + i, bad, "srcB", "en") for i in range(30)]
        + [(200 + i, good, "srcC", "en") for i in range(5)]
    )
    return spark.createDataFrame(
        rows, "doc_id int, text string, source string, lang string"
    )


def test_rollup_keeps_big_good_drops_bad_and_small(spark, prov_docs):
    out = {
        (r["source"], r["lang"]): r
        for r in source_quality_rollup(
            prov_docs, min_docs=20, min_mean_quality=0.5
        ).collect()
    }
    assert out[("srcA", "en")]["keep"] is True
    assert out[("srcB", "en")]["keep"] is False  # quality floor
    assert out[("srcB", "en")]["mean_quality"] < 0.5
    assert out[("srcC", "en")]["keep"] is False  # size floor
    assert out[("srcC", "en")]["mean_quality"] >= 0.5
    assert out[("srcA", "en")]["n_docs"] == 30
    assert out[("srcB", "en")]["low_quality_frac"] == 1.0
    assert out[("srcA", "en")]["low_quality_frac"] == 0.0


# --- fuzzy_decontam --------------------------------------------------------


def test_fuzzy_decontam_finds_cross_corpus_near_dups(spark):
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"  # ~0.9 jaccard
    far = " ".join(f"q{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(1, base), (2, far)], "doc_id int, text string"
    )
    ev = spark.createDataFrame([(900, near)], "doc_id int, text string")
    out = fuzzy_decontam(corpus, ev, n=3, tau=0.8).collect()
    assert [(r["doc_id"], r["eval_id"]) for r in out] == [(1, 900)]
    assert 0.8 <= out[0]["jaccard"] < 1.0


def test_fuzzy_decontam_never_pairs_within_corpus(spark):
    dup = " ".join(f"w{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(1, dup), (2, dup)], "doc_id int, text string"  # corpus-internal dup
    )
    ev = spark.createDataFrame(
        [(900, "totally different eval text here")],
        "doc_id int, text string",
    )
    # the corpus-internal duplicate pair must NOT appear: only
    # corpus x eval pairs are decontamination hits
    assert fuzzy_decontam(corpus, ev, n=3, tau=0.8).count() == 0


# --- temperature_rates -----------------------------------------------------


@pytest.fixture(scope="module")
def lang_docs(spark):
    rows = [(i, "en") for i in range(90)] + [(100 + i, "sw") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id int, lang string")


def test_temperature_flattens_distribution(spark, lang_docs):
    out = {r["lang"]: r for r in temperature_rates(lang_docs, 0.3).collect()}
    assert out["en"]["p_raw"] == 0.9 and out["sw"]["p_raw"] == 0.1
    # temperature pulls rates toward uniform: head down, tail up
    assert out["en"]["p_temp"] < out["en"]["p_raw"]
    assert out["sw"]["p_temp"] > out["sw"]["p_raw"]
    assert out["sw"]["upsample_factor"] > 1.0 > out["en"]["upsample_factor"]
    # rates still normalize
    assert out["en"]["p_temp"] + out["sw"]["p_temp"] == pytest.approx(
        1.0, abs=1e-5
    )
    # closed form: p_en = 90^.3 / (90^.3 + 10^.3)
    z = 90**0.3 + 10**0.3
    assert out["en"]["p_temp"] == pytest.approx(90**0.3 / z, abs=1e-6)


def test_temperature_alpha_one_is_identity(spark, lang_docs):
    out = {r["lang"]: r for r in temperature_rates(lang_docs, 1.0).collect()}
    for lang in ("en", "sw"):
        assert out[lang]["p_temp"] == pytest.approx(
            out[lang]["p_raw"], abs=1e-6
        )
        assert out[lang]["upsample_factor"] == pytest.approx(1.0, abs=1e-6)


def test_fuzzy_decontam_plan_bounds_shingle_join(spark):
    """The verify shingle-shingle join must be candidate-bounded: both
    shingle inputs pruned by a LeftSemi against the LSH candidates —
    same contract as minhash_lsh_dups' plan pin."""
    corpus = spark.createDataFrame(
        [(i, f"word{i} alpha beta gamma delta epsilon zeta") for i in range(10)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(900, "word1 alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    plan = (
        fuzzy_decontam(corpus, ev)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    inner = plan.find("Join Inner")
    assert inner >= 0
    assert "LeftSemi" in plan[inner:], plan
