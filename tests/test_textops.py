"""Training-data pipeline operators: text stats, dedupe family
(exact / n-gram Jaccard / MinHash-LSH / SimHash), similarity search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tspider_spark.operators import textdedup as TD
from tspider_spark.operators import textstats as TS
from tspider_spark.operators.similarity import (
    brute_force_topk,
    cosine_dup_pairs_lsh,
    ivf_topk,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup of 1
    (4, "el rapido zorro marron salta sobre el perro perezoso en la orilla del rio"),
    (5, "completely different content about distributed query engines and shuffles"),
    (6, "THE  Quick   brown fox jumps over the lazy dog near the river bank today"),  # ws/case dup of 1
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_text_stats(spark, docs_df):
    rows = {r["doc_id"]: r for r in TS.with_text_stats(docs_df).collect()}
    assert rows[1]["n_tokens"] == 14
    assert rows[1]["lang_pred"] == "en"
    assert rows[4]["lang_pred"] == "es"
    assert rows[5]["lang_pred"] == "und" or rows[5]["lang_pred"] == "en"
    assert rows[1]["fingerprint"] == rows[2]["fingerprint"] == rows[6]["fingerprint"]
    assert rows[1]["fingerprint"] != rows[3]["fingerprint"]
    assert 0.0 <= rows[1]["quality"] <= 1.0


def test_shingles_short_doc(spark):
    # regression: sequence(1,0) in Spark is DESCENDING, not empty
    df = spark.createDataFrame([(1, "two words"), (2, "exactly three words here")],
                               "doc_id long, text string")
    rows = TD.shingles(df, n=3).collect()
    got = {(r["doc_id"], r["shingle"]) for r in rows}
    assert got == {(2, "exactly three words"), (2, "three words here")}


def test_exact_dedupe(spark, docs_df):
    groups = TD.exact_dup_groups(docs_df).collect()
    assert len(groups) == 1
    assert groups[0]["keep_id"] == 1 and groups[0]["group_size"] == 3
    kept = {r["doc_id"] for r in TD.dedupe_exact(docs_df).collect()}
    assert kept == {1, 3, 4, 5}


def test_ngram_jaccard_and_minhash_agree(spark, docs_df):
    tau = 0.6
    brute = {
        (r["ia"], r["ib"]) for r in TD.ngram_jaccard_dups(docs_df, 3, tau).collect()
    }
    lsh = {
        (r["ia"], r["ib"])
        for r in TD.minhash_lsh_dups(docs_df, 3, tau, k=32, bands=16, rows=2).collect()
    }
    # near-dup + exact-dup pairs must be found; LSH must equal brute here
    assert (1, 2) in brute and (1, 6) in brute and (1, 3) in brute
    assert (4, 5) not in brute
    assert lsh == brute


def test_simhash_dups(spark, docs_df):
    pairs = {(r["ia"], r["ib"]): r["hamming"] for r in TD.simhash_dups(docs_df, 3).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 6)] == 0 and pairs[(2, 6)] == 0
    assert all(h <= 3 for h in pairs.values())
    assert (4, 5) not in pairs


@pytest.fixture(scope="module")
def emb_df(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    base = rng.standard_normal((40, 64)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    # near-dups of vec 0 and 1
    for j, src in ((100, 0), (101, 1)):
        noisy = base[src] + rng.standard_normal(64).astype("float32") * 0.01
        rows.append((j, [float(x) for x in noisy / np.linalg.norm(noisy)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(spark, emb_df):
    queries = emb_df.filter(F.col("vec_id") < 2)
    out = brute_force_topk(queries, emb_df, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cos_sim"]))
    assert [n for _, n, _ in sorted(by_q[0])][0] == 100  # its near-dup wins
    assert [n for _, n, _ in sorted(by_q[1])][0] == 101
    assert all(len(v) == 3 for v in by_q.values())


def test_cosine_lsh_dups(spark, emb_df):
    pairs = {
        (r["ia"], r["ib"]): r["cos_sim"]
        for r in cosine_dup_pairs_lsh(emb_df, tau=0.95, dim=64).collect()
    }
    assert (0, 100) in pairs and (1, 101) in pairs
    assert all(v >= 0.95 for v in pairs.values())


def test_ivf_topk_recall(spark, emb_df):
    queries = emb_df.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(queries, emb_df, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(queries, emb_df, k=5, n_lists=8, n_probe=6, dim=64).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall too low: {recall}"
    # probing every list recovers the exact answer (the IVF contract:
    # n_probe trades recall for scan fraction, converging to exact)
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(queries, emb_df, k=5, n_lists=8, n_probe=8, dim=64).collect()
    }
    assert full == exact


def test_bm25_ranks_relevant_docs_higher(spark):
    from tspider_spark.operators.textstats import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "training data for the model is training data"),
            (2, "model training"),
            (3, "nothing relevant here at all whatsoever today"),
            (4, "data"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["training", "data"]).collect()}
    assert 3 not in got                    # zero matching terms -> absent
    assert got[1] > got[4] > 0             # more matches -> higher score
    assert got[2] > 0


def test_semdedup_drops_copy_keeps_first(spark):
    from tspider_spark.operators.similarity import semdedup

    # two tight directions: e0-ish (ids 1, 2 identical; 5 nearly so)
    # and e1-ish (id 3; id 4 orthogonal-ish) — with n_clusters=2 the
    # centroids are the vectors of ids 1 and 2 (identical), so ties
    # go to centroid 1 and every e0-like row lands in cluster 1.
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0]),
        (5, [0.999, 0.0447, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semdedup(df, tau=0.95, n_clusters=2).collect()}
    assert out[1]["kept"] == 1 and out[1]["cluster_id"] == 1
    # exact copy of a lower id in the same cluster -> dropped
    assert out[2]["kept"] == 0
    # near-copy (cos ~ 0.999) also dropped, id 1 is the keeper
    assert out[5]["kept"] == 0 and out[5]["cluster_id"] == 1
    # items without a lower-id near-dup survive
    assert out[3]["kept"] == 1 and out[4]["kept"] == 1


def test_semdedup_all_jvm(spark):
    from tspider_spark.operators.similarity import semdedup

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    plan = (
        semdedup(df, n_clusters=2)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the centroid side of the assignment join must be broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def _semdedup_fixture(spark, n=80, dups=20):
    """n base vectors on distinct directions + `dups` exact copies of
    the first `dups` ids (copy id = base id + 1000)."""
    import math

    rows = []
    for i in range(n):
        a = 2 * math.pi * i / n
        rows.append((i, [math.cos(a), math.sin(a), 0.1 * (i % 3)]))
    rows += [(i + 1000, rows[i][1]) for i in range(dups)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_scale_config_matches_exact(spark):
    """The scale configuration (hash-sampled centroids + one Lloyd
    refinement + derived n_clusters) keeps the invariant that every
    exact copy is dropped and its lower-id original kept — identical
    vectors always share a cluster (argmax cosine is a pure function
    of the vector)."""
    from tspider_spark.operators.similarity import semdedup

    df = _semdedup_fixture(spark)
    out = {
        r["vec_id"]: r
        for r in semdedup(
            df, tau=0.999, n_clusters=None, target_cluster_size=10,
            centroid_mode="hash", refine_iters=1,
        ).collect()
    }
    assert len(out) == 100
    for i in range(20):
        assert out[i]["kept"] == 1, i
        assert out[i + 1000]["kept"] == 0, i
        assert out[i]["cluster_id"] == out[i + 1000]["cluster_id"]
    # derived k = ceil(100/10) = 10 < 16 floor -> 16 clusters max used
    assert len({r["cluster_id"] for r in out.values()}) <= 16


def test_semdedup_numpy_assign_matches_fold(spark):
    from tspider_spark.operators.similarity import semdedup

    df = _semdedup_fixture(spark, n=40, dups=10)
    kw = dict(tau=0.999, n_clusters=6, centroid_mode="hash", refine_iters=1)
    fold = sorted(semdedup(df, assign="fold", **kw).collect())
    npy = sorted(semdedup(df, assign="numpy", **kw).collect())
    assert fold == npy


def test_semdedup_lsh_bound_catches_exact_dups(spark):
    """lsh_planes bounds the in-cluster pair join; exact duplicates
    share every sign bucket, so none are missed, and the bounded
    variant's drops are a subset of the exact variant's."""
    from tspider_spark.operators.similarity import semdedup

    df = _semdedup_fixture(spark)
    kw = dict(tau=0.999, n_clusters=4, centroid_mode="hash", refine_iters=0)
    exact = {r["vec_id"]: r["kept"] for r in semdedup(df, **kw).collect()}
    lsh = {
        r["vec_id"]: r["kept"]
        for r in semdedup(df, lsh_planes=8, lsh_tables=4, dim=3, **kw).collect()
    }
    for i in range(20):
        assert lsh[i + 1000] == 0  # every exact copy still dropped
    dropped_lsh = {k for k, v in lsh.items() if v == 0}
    dropped_exact = {k for k, v in exact.items() if v == 0}
    assert dropped_lsh <= dropped_exact


def test_token_quantiles_exact_and_approx(spark):
    from tspider_spark.operators.textstats import token_quantiles

    rows = [(i, "en", " ".join(["w"] * (i + 1))) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    ex = token_quantiles(df, ps=(0.5, 0.9)).collect()[0]
    # lengths 1..100: p50 interpolates at rank 0.5*99 = 49.5 -> 50.5
    assert ex["n_docs"] == 100
    assert abs(ex["p50"] - 50.5) < 1e-9
    assert abs(ex["p90"] - 90.1) < 1e-9
    # the approx (sketch) twin lands within rank-error of exact
    ap = token_quantiles(df, ps=(0.5, 0.9), exact=False, accuracy=10000).collect()[0]
    assert abs(ap["p50"] - 50.5) <= 1.0 and abs(ap["p90"] - 90.1) <= 1.0


def test_heaps_fit_on_synthetic_growth(spark):
    """A corpus of all-new words per doc fits beta ~ 1; a corpus that
    repeats one fixed vocabulary saturates toward beta ~ 0."""
    import math

    from tspider_spark.operators.textstats import heaps_stats

    # letter-only unique words (the tokenizer is [a-z]+, so digits
    # would split): word k -> 'w' + 3-letter base-26 encoding
    def _w(k):
        return "w" + "".join(
            chr(97 + (k // 26 ** p) % 26) for p in (2, 1, 0)
        )

    novel = [
        (i, " ".join(_w(i * 20 + j) for j in range(20))) for i in range(30)
    ]
    fixed = [(i, "alpha beta gamma delta epsilon") for i in range(30)]
    dfn = spark.createDataFrame(novel, "doc_id long, text string")
    dff = spark.createDataFrame(fixed, "doc_id long, text string")
    rn = heaps_stats(dfn).collect()[0]
    rf = heaps_stats(dff).collect()[0]
    assert rn["n_points"] == 30 and rf["n_points"] == 30
    assert rn["n_types"] == 600 and rn["n_tokens"] == 600
    assert rn["heaps_beta"] > 0.97          # every token novel
    assert rf["heaps_beta"] < 0.2           # vocabulary saturates
    # the all-novel fit is exact: V = N -> beta 1, ln k 0
    assert abs(rn["heaps_beta"] - 1.0) < 1e-6
    assert abs(rn["heaps_ln_k"]) < 1e-6
    assert math.isfinite(rf["heaps_ln_k"])


def test_stratum_cumsum_matches_brute_force_on_skewed_string_ids(spark):
    """The three-level cumsum (range-partition buckets + super-bucket
    window + triangular join) must equal the sequential exclusive
    cumsum for ANY stratum shape — including the constant stratum the
    suffix-array corpus builder uses — on string ids that share long
    prefixes (one mega-host + tail, the shape that broke the old
    24-char-prefix bucketing)."""
    import random

    from pyspark.sql import functions as F

    from tspider_spark.operators.curate import _exclusive_stratum_cumsum

    rng = random.Random(7)
    rows = []
    for i in range(2000):
        host = (
            "http://mega.example.com/path/deep/"
            if i % 5
            else f"http://h{i % 37}.net/"
        )
        rows.append(
            (f"{host}{i:07d}", rng.choice(["en", "de", "fr"]),
             rng.randrange(0, 50))
        )
    df = spark.createDataFrame(
        rows, "doc_id string, lang string, n_tokens int"
    )
    expected = {}
    for lang in ("en", "de", "fr"):
        c = 0
        for did, lg, t in sorted(rows):
            if lg == lang:
                expected[did] = c
                c += t
    out = _exclusive_stratum_cumsum(
        df, "lang", "doc_id", "n_tokens", 4, range_partitions=8
    )
    got = {r["doc_id"]: r["_cum"] for r in out.collect()}
    assert got == expected

    # constant stratum (the suffix-array shape)
    df2 = df.select("doc_id", F.lit(0).alias("_one"), "n_tokens")
    exp2, c = {}, 0
    for did, lg, t in sorted(rows):
        exp2[did] = c
        c += t
    out2 = _exclusive_stratum_cumsum(
        df2, "_one", "doc_id", "n_tokens", 4, range_partitions=8
    )
    got2 = {r["doc_id"]: r["_cum"] for r in out2.collect()}
    assert got2 == exp2
