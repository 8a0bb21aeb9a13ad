"""Round-3d operators: D4 diversity pruning (SemDeDup + SSL-prototype
pruning) and mirror-host detection over winnowing fingerprints."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tspider_spark.operators.similarity import d4_prune
from tspider_spark.operators.textdedup import mirror_host_pairs


# --- d4_prune ----------------------------------------------------------------


@pytest.fixture(scope="module")
def d4_vecs(spark):
    # 12 base vectors in 4 dims with distinct directions, doubled:
    # every +100 copy is an exact semantic dup of its original.
    base = []
    for i in range(12):
        a = 0.3 + 0.05 * i
        base.append((i, [math.cos(a), math.sin(a), 0.1 * i, 1.0]))
    rows = base + [(i + 100, v) for i, v in base]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_d4_copies_dropped_and_originals_kept_flags(d4_vecs):
    out = d4_prune(
        d4_vecs, tau=0.999999, prune_frac=0.25, n_clusters=2,
        centroid_mode="first",
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 24
    # exact duplicates: the higher id of each identical pair is
    # sem-dropped, and kept=0 follows
    for i in range(12):
        assert by_id[i + 100]["sem_kept"] == 0
        assert by_id[i + 100]["kept"] == 0
        assert by_id[i]["sem_kept"] == 1
    # kept=1 implies sem_kept=1 everywhere
    for r in out:
        if r["kept"] == 1:
            assert r["sem_kept"] == 1


def test_d4_prunes_exact_per_cluster_quota(d4_vecs):
    out = d4_prune(
        d4_vecs, tau=0.999999, prune_frac=0.25, n_clusters=2,
        centroid_mode="first",
    )
    per_cluster = (
        out.filter(F.col("sem_kept") == 1)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("kept") == 0).cast("int")).alias("pruned"),
        )
        .collect()
    )
    assert per_cluster
    for r in per_cluster:
        assert r["pruned"] == math.ceil(r["n"] * 0.25)


def test_d4_prunes_most_prototypical_first(spark):
    # one cluster seeded by the smallest id (centroid = v0): the
    # survivor with the HIGHEST cosine to v0 must be the pruned one
    rows = [
        (0, [1.0, 0.0]),          # centroid seed
        (1, [0.99, 0.141067]),    # closest survivor -> pruned
        (2, [0.7, 0.714143]),
        (3, [0.3, 0.953939]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in d4_prune(
            df, tau=0.999999, prune_frac=0.25, n_clusters=1,
            centroid_mode="first",
        ).collect()
    }
    # 4 survivors, ceil(4*0.25)=1 pruned: the most prototypical (id 0
    # itself is the centroid at cosine 1.0, so id 0 is pruned first)
    pruned = [i for i, r in out.items() if r["sem_kept"] == 1 and r["kept"] == 0]
    assert pruned == [0]


def test_d4_cluster_join_is_not_cartesian(d4_vecs):
    plan = d4_prune(
        d4_vecs, tau=0.95, prune_frac=0.25, n_clusters=2,
        centroid_mode="first",
    )._jdf.queryExecution().executedPlan().toString()
    # the within-cluster pair step must be an equi-join on cluster_id;
    # the only nested-loop joins allowed are the broadcast centroid
    # cross joins (k rows)
    for line in plan.splitlines():
        if "CartesianProduct" in line:
            raise AssertionError(f"cartesian product in plan: {line}")


# --- mirror_host_pairs -------------------------------------------------------


@pytest.fixture(scope="module")
def mirror_docs(spark):
    # hostA and hostB serve identical content (full mirror); hostC
    # serves half of hostA's docs (partial mirror, subset side);
    # hostD shares nothing beyond short fragments.
    pages = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a completely different second page about distributed query engines",
        "third page discussing rolling hash fingerprints and winnowing windows",
        "fourth page on politeness budgets and per host crawl scheduling",
    ]
    rows = []
    did = 0
    for host in ("hostA", "hostB"):
        for p in pages:
            rows.append((did, p, host))
            did += 1
    for p in pages[:2]:
        rows.append((did, p, "hostC"))
        did += 1
    rows.append((did, "totally unrelated content with zero long shared substrings here", "hostD"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_mirror_full_clone_scores_one(mirror_docs):
    out = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_host_pairs(
            mirror_docs, min_shared=3, overlap_threshold=0.5, max_fp_hosts=16
        ).collect()
    }
    ab = out[("hostA", "hostB")]
    assert ab["overlap"] == 1.0
    assert ab["is_mirror"] == 1
    assert ab["shared_fps"] == ab["fps_a"] == ab["fps_b"]


def test_mirror_partial_clone_min_side(mirror_docs):
    out = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_host_pairs(
            mirror_docs, min_shared=3, overlap_threshold=0.5, max_fp_hosts=16
        ).collect()
    }
    ac = out[("hostA", "hostC")]
    # hostC's fingerprints are a subset of hostA's: overlap coefficient
    # is 1.0 on the min side even though Jaccard would be ~0.5
    assert ac["overlap"] == 1.0
    assert ac["is_mirror"] == 1
    assert ac["fps_b"] < ac["fps_a"]
    # the unrelated host never pairs above min_shared
    assert not any("hostD" in k for k in out)


def test_mirror_output_is_canonical_and_bounded(mirror_docs):
    rows = mirror_host_pairs(
        mirror_docs, min_shared=1, overlap_threshold=0.5, max_fp_hosts=16
    ).collect()
    for r in rows:
        assert r["host_a"] < r["host_b"]
        assert 0.0 < r["overlap"] <= 1.0
        assert r["shared_fps"] <= min(r["fps_a"], r["fps_b"])


def test_mirror_hot_fp_guard_drops_boilerplate(spark):
    # 20 hosts all carrying the same boilerplate sentence: with
    # max_fp_hosts=16 the shared fingerprints are doc-frequency
    # filtered, so NO pair survives even at min_shared=1
    boiler = "copyright notice all rights reserved contact us terms of service"
    rows = [(i, boiler, f"h{i:02d}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = mirror_host_pairs(
        df, min_shared=1, overlap_threshold=0.5, max_fp_hosts=16
    ).collect()
    assert out == []
    # raising the guard above the host count brings the pairs back
    out2 = mirror_host_pairs(
        df, min_shared=1, overlap_threshold=0.5, max_fp_hosts=32
    ).collect()
    assert len(out2) == 20 * 19 // 2


def test_mirror_pair_join_is_equi_join(mirror_docs):
    plan = mirror_host_pairs(mirror_docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- resolve_redirects -------------------------------------------------------


def _resolve(spark, edges, rounds=3):
    from tspider_spark.operators.graph import resolve_redirects

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["final"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, rounds=rounds).collect()
    }


def test_redirect_chain_resolves_exact_hops(spark):
    # 1 -> 2 -> 3 -> 4 (terminal)
    out = _resolve(spark, [(1, 2), (2, 3), (3, 4)])
    assert out[1] == (4, 3, 1)
    assert out[2] == (4, 2, 1)
    assert out[3] == (4, 1, 1)
    assert out[4] == (4, 0, 1)


def test_redirect_cycle_truncates_at_cap(spark):
    # 2-cycle: with rounds=3 the cap is 2**3 - 1 = 7 hops
    out = _resolve(spark, [(1, 2), (2, 1)])
    final, hops, resolved = out[1]
    assert hops == 7 and resolved == 0
    assert final == 2  # 7 hops from 1 around a 2-cycle lands on 2
    assert out[2] == (1, 7, 0)


def test_redirect_long_chain_truncates(spark):
    # 0 -> 1 -> ... -> 10 (length 10 > cap 7)
    out = _resolve(spark, [(i, i + 1) for i in range(10)])
    assert out[0] == (7, 7, 0)   # 7 hops in, final still has an out-edge
    assert out[3] == (10, 7, 1)  # 7 hops from 3 reaches the terminal
    assert out[5] == (10, 5, 1)  # shorter distance: exact hop count
    assert out[10] == (10, 0, 1)


def test_redirect_duplicate_src_keeps_min_dst(spark):
    out = _resolve(spark, [(1, 5), (1, 3), (3, 9)])
    # functional collapse: 1 -> 3 (min dst), then 3 -> 9
    assert out[1] == (9, 2, 1)


def test_redirect_plan_has_no_cartesian(spark):
    from tspider_spark.operators.graph import resolve_redirects

    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    plan = resolve_redirects(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# --- tokenizer_fertility -----------------------------------------------------


def test_tokenizer_fertility_hand_computed(spark):
    from tspider_spark.operators.textstats import tokenizer_fertility

    rows = [
        (1, "don't stop", "en"),   # words: 2; bpeish: don ' t stop = 4
        (2, "hello world", "en"),  # words: 2; bpeish: 2
        (3, "a b-c", "de"),        # words: 2; bpeish: a b - c = 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in tokenizer_fertility(df).collect()}
    en = out["en"]
    assert en["n_docs"] == 2 and en["n_words"] == 4
    assert en["n_subword_tokens"] == 6
    assert en["fertility"] == 1.5
    assert en["chars_per_token"] == round((10 + 11) / 6, 6)
    de = out["de"]
    assert de["n_words"] == 2 and de["n_subword_tokens"] == 4
    assert de["fertility"] == 2.0
