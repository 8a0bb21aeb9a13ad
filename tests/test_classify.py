"""linear quality classifier (fastText-style hashed-ngram scoring)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from tspider_spark.operators.classify import (
    hashed_gram_features,
    linear_quality_scores,
    md5_stub_weights,
)

DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog"),
    ("d2", "free money casino click here click here"),
    ("d3", "single"),
    ("d4", "   "),
    ("d5", ""),
    ("d6", "two tokens"),
]


def _py_grams(text):
    toks = [w for w in text.strip().lower().split() if w]
    return toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]


def _py_bucket(gram, n_buckets):
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % n_buckets


def _py_weight(bucket, seed="qcw"):
    hv = int(hashlib.md5(f"{seed}-{bucket}".encode()).hexdigest()[:15], 16)
    return (hv % 2000001 - 1000000) / 1000000.0


def _py_score(text, n_buckets, bias=0.0):
    grams = _py_grams(text)
    if not grams:
        return None
    s = bias + sum(_py_weight(_py_bucket(g, n_buckets)) for g in grams) / len(grams)
    return s


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_features_match_python(spark, docs_df):
    nb = 64
    got = {
        (r.doc_id, r.bucket): r.cnt
        for r in hashed_gram_features(docs_df, nb).collect()
    }
    exp = {}
    for did, text in DOCS:
        for g in _py_grams(text):
            k = (did, _py_bucket(g, nb))
            exp[k] = exp.get(k, 0) + 1
    assert got == exp
    # d4/d5 (no grams) produce no feature rows; d3 has exactly one
    assert not any(k[0] in ("d4", "d5") for k in got)
    assert sum(c for (d, _), c in got.items() if d == "d3") == 1


def test_scores_match_python(spark, docs_df):
    nb = 64
    w = md5_stub_weights(spark, nb)
    out = {r.doc_id: r for r in linear_quality_scores(docs_df, w, nb).collect()}
    assert set(out) == {"d1", "d2", "d3", "d6"}
    for did, text in DOCS:
        exp = _py_score(text, nb)
        if exp is None:
            continue
        r = out[did]
        assert r.score == pytest.approx(round(exp, 6), abs=2e-6)
        assert r.prob == pytest.approx(round(1 / (1 + math.exp(-exp)), 6), abs=2e-6)
        assert r.keep == (round(1 / (1 + math.exp(-exp)), 6) >= 0.5)
        assert r.n_grams == len(_py_grams(text))


def test_weight_join_is_broadcast(spark, docs_df):
    w = md5_stub_weights(spark, 4096)
    plan = (
        linear_quality_scores(docs_df, w, 4096)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bias_only_when_all_buckets_unweighted(spark, docs_df):
    # weights covering zero buckets -> every doc scores exactly bias
    empty_w = md5_stub_weights(spark, 8).filter("bucket < 0")
    out = linear_quality_scores(docs_df, empty_w, 8, bias=1.5).collect()
    assert out and all(r.score == 1.5 for r in out)
    assert all(r.keep for r in out)  # sigmoid(1.5) > 0.5


def test_xxhash_path_same_shape(spark, docs_df):
    # the scale-path hash produces the same feature SHAPE (per-doc gram
    # totals identical; buckets differ by design) and scores every doc
    from tspider_spark.operators.classify import hashed_gram_features

    md5 = hashed_gram_features(docs_df, 64, hash_fn="md5")
    xx = hashed_gram_features(docs_df, 64, hash_fn="xxhash64")
    tot_md5 = {r.doc_id: r.t for r in md5.groupBy("doc_id").agg(
        F.sum("cnt").alias("t")).collect()}
    tot_xx = {r.doc_id: r.t for r in xx.groupBy("doc_id").agg(
        F.sum("cnt").alias("t")).collect()}
    assert tot_md5 == tot_xx
    w = md5_stub_weights(spark, 64)
    out = linear_quality_scores(docs_df, w, 64, hash_fn="xxhash64").collect()
    assert {r.doc_id for r in out} == {"d1", "d2", "d3", "d6"}
