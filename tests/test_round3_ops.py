"""Round-3 operators: HITS host authority, interpolated bigram LM,
DSIR Gumbel-top-m resampling, URL-pattern trap detection, and int8
scalar-quantized ANN."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tspider_spark.operators.filters import detect_pattern_traps
from tspider_spark.operators.graph import hits
from tspider_spark.operators.quality import bigram_logprob, dsir_resample
from tspider_spark.operators.similarity import brute_force_topk, sq_topk


# ---------------------------------------------------------------------------
# HITS


def test_hits_star_graph(spark):
    # hubs h1..h3 all point at authority a; a points nowhere.
    edges = spark.createDataFrame(
        [("h1", "a"), ("h2", "a"), ("h3", "a")], "src string, dst string"
    )
    rows = {r["node"]: r for r in hits(edges, iters=5).collect()}
    assert rows["a"]["authority"] == pytest.approx(1.0)
    assert rows["a"]["hub"] == 0.0
    for h in ("h1", "h2", "h3"):
        assert rows[h]["hub"] == pytest.approx(1 / 3, abs=1e-6)
        assert rows[h]["authority"] == 0.0


def test_hits_scores_sum_to_one(spark):
    edges = spark.createDataFrame(
        [(f"n{i % 7}", f"n{(i * 3 + 1) % 7}") for i in range(30)],
        "src string, dst string",
    ).filter(F.col("src") != F.col("dst"))
    out = hits(edges, iters=10)
    sums = out.agg(F.sum("hub").alias("h"), F.sum("authority").alias("a")).first()
    assert sums["h"] == pytest.approx(1.0, abs=1e-4)
    assert sums["a"] == pytest.approx(1.0, abs=1e-4)


def test_hits_distinguishes_hub_from_authority(spark):
    # d is a directory linking to c1..c3; c1..c3 also link to each
    # other's target c1 -> d has max hub, c1 max authority.
    edges = spark.createDataFrame(
        [("d", "c1"), ("d", "c2"), ("d", "c3"), ("c2", "c1"), ("c3", "c1")],
        "src string, dst string",
    )
    rows = {r["node"]: r for r in hits(edges, iters=10).collect()}
    assert rows["d"]["hub"] == max(r["hub"] for r in rows.values())
    assert rows["c1"]["authority"] == max(r["authority"] for r in rows.values())


# ---------------------------------------------------------------------------
# bigram LM


def test_bigram_logprob_hand_computed(spark):
    # corpus: "a b", "a b", "a c" -> bigrams: (a,b) x2, (a,c) x1
    # cnt_prev(a)=3; unigrams: a:3 b:2 c:1, total=6, vocab=3
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob(docs, lam=0.7).collect()}
    p_ab = 0.7 * (2 / 3) + 0.3 * ((2 + 1) / (6 + 3))
    p_ac = 0.7 * (1 / 3) + 0.3 * ((1 + 1) / (6 + 3))
    assert out[1]["n_bigrams"] == 1
    assert out[1]["bits_per_token"] == pytest.approx(-math.log2(p_ab), abs=1e-6)
    assert out[3]["bits_per_token"] == pytest.approx(-math.log2(p_ac), abs=1e-6)
    # repeated common bigram scores lower (more likely) than the rare one
    assert out[1]["bits_per_token"] < out[3]["bits_per_token"]


def test_bigram_logprob_skips_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two words")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in bigram_logprob(docs).collect()}
    assert ids == {3}


# ---------------------------------------------------------------------------
# DSIR resampling


@pytest.fixture(scope="module")
def dsir_pool(spark):
    rows = [(i, ("target words " if i % 3 == 0 else "raw noise ") * 5)
            for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_resample_deterministic_and_sized(spark, dsir_pool):
    tgt = spark.createDataFrame(
        [(1000, "target words target words")], "doc_id long, text string"
    )
    a = dsir_resample(dsir_pool, tgt, m=10).collect()
    b = dsir_resample(dsir_pool, tgt, m=10).collect()
    assert len(a) == 10
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dsir_resample_biased_toward_target(spark, dsir_pool):
    tgt = spark.createDataFrame(
        [(1000, "target words target words")], "doc_id long, text string"
    )
    sel = dsir_resample(dsir_pool, tgt, m=20).collect()
    n_targetlike = sum(1 for r in sel if r["doc_id"] % 3 == 0)
    # 1/3 of the pool is target-like but should dominate the draw
    assert n_targetlike > 10


# ---------------------------------------------------------------------------
# trap detection


def test_detect_pattern_traps(spark):
    rows = []
    # trap.com: every URL its own pattern (session ids the digit
    # normalization can't collapse)
    for i in range(30):
        rows.append(("trap.com", f"http://trap.com/s/x{i}y", f"http://trap.com/s/x{{d}}y{i}"))
    # ok.com: 30 urls collapsing to 2 patterns
    for i in range(30):
        rows.append(("ok.com", f"http://ok.com/p/{i}", f"http://ok.com/p/{{digit}}-{i % 2}"))
    df = spark.createDataFrame(rows, "hostname string, url string, pattern string")
    out = {r["hostname"]: r for r in detect_pattern_traps(
        df, min_urls=20, max_patterns_per_url=0.5).collect()}
    assert out["trap.com"]["is_trap"] is True
    assert out["trap.com"]["n_patterns"] == 30
    assert out["ok.com"]["is_trap"] is False
    assert out["ok.com"]["patterns_per_url"] == pytest.approx(2 / 30, abs=1e-6)
    # below min_urls never flags
    small = detect_pattern_traps(df, min_urls=100, max_patterns_per_url=0.5)
    assert all(not r["is_trap"] for r in small.collect())


# ---------------------------------------------------------------------------
# scalar-quantized ANN


def test_sq_topk_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(80)]
    # planted near-dups so top-1 is unambiguous for low ids
    vecs = [(i, v) for i, v in enumerate(base)]
    vecs += [(1000 + i, [x + rng.gauss(0, 0.01) for x in base[i]]) for i in range(5)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 5)
    got = set(
        map(tuple, sq_topk(q, df, k=3, rescore_factor=4)
            .select("query_id", "rank", "neighbor_id").collect())
    )
    exp = set(
        map(tuple, brute_force_topk(q, df, k=3)
            .select("query_id", "rank", "neighbor_id").collect())
    )
    assert got == exp
    # the planted copy is every low query's top-1
    top1 = {g[0]: g[2] for g in got if g[1] == 1}
    assert top1 == {i: 1000 + i for i in range(5)}


def test_sq_topk_candidate_cut_is_integer(spark):
    # quantized codes are ints in [-127, 127]: pin the property that
    # the approximate stage never leaves integer arithmetic by checking
    # reproducibility under repartitioning (float-sum-order ties would
    # break this)
    import random

    rng = random.Random(11)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 4)
    a = sq_topk(q, df, k=5).select("query_id", "rank", "neighbor_id").collect()
    b = (
        sq_topk(q.repartition(7), df.repartition(13), k=5)
        .select("query_id", "rank", "neighbor_id")
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
