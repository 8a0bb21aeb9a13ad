"""Round-3e operators: deterministic label propagation (community
detection over the host graph) and the C4-style bad-words gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from tspider_spark.operators.graph import label_propagation
from tspider_spark.operators.quality import badwords_filter


# --- label_propagation -------------------------------------------------------


def test_lpa_two_cliques_converge_to_two_communities(spark):
    # Two 4-cliques joined by a single bridge edge: LPA must settle on
    # exactly two communities, each labelled by its smallest member.
    clique_a = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique_b = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(
        clique_a + clique_b + [(3, 10)], "src long, dst long"
    )
    out = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iters=5).collect()
    }
    assert len(out) == 8
    assert all(out[n] == 0 for n in range(4))
    assert all(out[n] == 10 for n in range(10, 14))


def test_lpa_symmetric_and_self_loop_free(spark):
    # Direction must not matter (undirected semantics) and self-loops
    # must be ignored rather than letting a node vote for itself.
    e1 = spark.createDataFrame([(1, 2), (2, 3), (3, 3)], "src long, dst long")
    e2 = spark.createDataFrame([(2, 1), (3, 2), (3, 3)], "src long, dst long")
    r1 = sorted(map(tuple, label_propagation(e1, iters=4).collect()))
    r2 = sorted(map(tuple, label_propagation(e2, iters=4).collect()))
    assert r1 == r2
    assert all(n != 3 or c != 3 or True for n, c in r1)  # no crash path
    # node 3's only real neighbor chain is 2-1, so its label descends
    assert dict(r1)[3] == 1


def test_lpa_deterministic_tie_break_smallest_label(spark):
    # A node with two equally-frequent neighbor labels adopts the
    # smaller one (total tie-break -> engine-independent result).
    edges = spark.createDataFrame([(5, 1), (5, 9)], "src long, dst long")
    out = dict(
        map(tuple, label_propagation(edges, iters=1).collect())
    )
    assert out[5] == 1


def test_lpa_plan_has_no_single_partition_window(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    plan = label_propagation(edges, iters=2)._jdf.queryExecution().toString()
    assert "SinglePartition" not in plan
    assert "Window" not in plan


# --- badwords_filter ----------------------------------------------------------


def test_badwords_counts_nondistinct_and_boundaries(spark):
    df = spark.createDataFrame(
        [
            (1, "Clean text only here"),
            (2, "BadWord! badword, BADWORD."),
            (3, "notbadword embedded does not hit"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in badwords_filter(df, words=("badword",)).collect()}
    assert out[1]["n_badword_hits"] == 0 and out[1]["keep"]
    # punctuation-delimited occurrences all hit, case-insensitively
    assert out[2]["n_badword_hits"] == 3 and not out[2]["keep"]
    # substring inside a longer alphanumeric run must NOT hit
    assert out[3]["n_badword_hits"] == 0 and out[3]["keep"]
    assert out[4]["n_tokens"] == 0 and out[4]["keep"]
    assert out[2]["badword_frac"] == 1.0


def test_badwords_shuffle_free_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        badwords_filter(df, words=("a", "b"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- link_reciprocity ---------------------------------------------------------


def test_reciprocity_counts_mutual_pairs(spark):
    from tspider_spark.operators.graph import link_reciprocity

    edges = spark.createDataFrame(
        # a<->b mutual; a->c one-way; duplicate a->b must not double;
        # self-loop d->d ignored entirely
        [("a", "b"), ("b", "a"), ("a", "c"), ("a", "b"), ("d", "d")],
        "src string, dst string",
    )
    out = {r["host"]: r for r in link_reciprocity(edges).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["out_links"] == 2
    assert out["a"]["reciprocal_links"] == 1
    assert out["a"]["reciprocity"] == 0.5
    assert out["b"]["out_links"] == 1 and out["b"]["reciprocity"] == 1.0


# --- triangle_counts ----------------------------------------------------------


def test_triangles_k4_and_path(spark):
    from tspider_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    path = [(10, 11), (11, 12)]  # no triangle
    edges = spark.createDataFrame(k4 + path, "src long, dst long")
    out = {r["node"]: r["triangles"] for r in triangle_counts(edges).collect()}
    # K4 has C(4,3)=4 triangles; each vertex sits in C(3,2)=3 of them
    assert all(out[n] == 3 for n in range(4))
    assert out[10] == 0 and out[11] == 0 and out[12] == 0


def test_triangles_direction_and_duplicate_invariant(spark):
    from tspider_spark.operators.graph import triangle_counts

    e1 = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    e2 = spark.createDataFrame(
        [(2, 1), (3, 2), (1, 3), (2, 1)], "src long, dst long"
    )
    r1 = sorted(map(tuple, triangle_counts(e1).collect()))
    r2 = sorted(map(tuple, triangle_counts(e2).collect()))
    assert r1 == r2 == [(1, 1), (2, 1), (3, 1)]


def test_triangles_hub_star_has_none(spark):
    from tspider_spark.operators.graph import triangle_counts

    # star around a hub: many wedges, zero triangles — the degree
    # orientation must not explode the hub into a wedge pivot
    star = [(0, i) for i in range(1, 30)]
    edges = spark.createDataFrame(star, "src long, dst long")
    out = triangle_counts(edges)
    assert out.filter(F.col("triangles") > 0).count() == 0
    assert out.count() == 30


# --- inverted_index -----------------------------------------------------------


def test_inverted_index_df_bounds_and_posting_head(spark):
    from tspider_spark.operators.textstats import inverted_index

    docs = spark.createDataFrame(
        [
            (3, "apple banana apple"),
            (1, "apple cherry"),
            (2, "apple banana"),
            (4, "unique-once"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["term"]: r
        for r in inverted_index(docs, min_df=2, max_df=2, head=2).collect()
    }
    # apple df=4 > max_df pruned; 'unique'/'once' df=1 < min_df pruned
    assert set(out) == {"banana"}
    assert out["banana"]["df"] == 2
    # sorted ascending, head-capped, within-doc repeats deduped
    assert out["banana"]["posting_head"] == "2,3"


def test_inverted_index_fractional_cap(spark):
    from tspider_spark.operators.textstats import inverted_index

    docs = spark.createDataFrame(
        [(i, "common " + ("rare" if i < 2 else "filler")) for i in range(10)],
        "doc_id long, text string",
    )
    out = {
        r["term"]: r["df"]
        for r in inverted_index(docs, min_df=2, max_df_frac=0.5).collect()
    }
    # common df=10 > 0.5*10 pruned; rare df=2 kept; filler df=8 pruned
    assert out == {"rare": 2}


# --- weighted_sample_k --------------------------------------------------------


def test_weighted_sample_k_deterministic_and_bounded(spark):
    from tspider_spark.operators.curate import weighted_sample_k

    docs = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(200)] + [(999, 0), (998, -3)],
        "doc_id long, w long",
    )
    a = weighted_sample_k(docs, k=25, weight_col="w").collect()
    b = weighted_sample_k(docs, k=25, weight_col="w").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 25
    ids = {r["doc_id"] for r in a}
    assert 999 not in ids and 998 not in ids  # non-positive weights race never
    # different salt -> different (deterministic) winner set
    c = weighted_sample_k(docs, k=25, weight_col="w", salt="other").collect()
    assert {r["doc_id"] for r in c} != ids


def test_weighted_sample_k_weight_proportional_inclusion(spark):
    from tspider_spark.operators.curate import weighted_sample_k

    # 500 light rows (w=1) + 500 heavy rows (w=20): heavy rows must
    # dominate the sample (expected ~95% of slots; md5 clocks are
    # uniform enough that >70% is a safe deterministic bound)
    rows = [(i, 1) for i in range(500)] + [(i + 1000, 20) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_sample_k(docs, k=100, weight_col="w").collect()
    heavy = sum(1 for r in out if r["doc_id"] >= 1000)
    assert heavy > 70


def test_weighted_sample_k_plans_as_take_ordered(spark):
    from tspider_spark.operators.curate import weighted_sample_k

    docs = spark.createDataFrame([(1, 2)], "doc_id long, w long")
    plan = (
        weighted_sample_k(docs, k=5, weight_col="w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


# --- plan pins for the round-3e graph/index ops -------------------------------


def test_triangles_plan_no_windows_no_python(spark):
    from tspider_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    qe = triangle_counts(edges)._jdf.queryExecution()
    plan = qe.toString()
    assert "Window" not in plan and "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # no unbounded cross product anywhere in the triangle closure
    assert "CartesianProduct" not in qe.executedPlan().toString()


def test_inverted_index_plan_no_windows_no_python(spark):
    from tspider_spark.operators.textstats import inverted_index

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    qe = inverted_index(docs, max_df_frac=0.5)._jdf.queryExecution()
    plan = qe.toString()
    # NOTE: the fractional cap carries corpus size N as a 1-row scalar
    # aggregate (broadcast cross join) — that final agg IS a
    # SinglePartition exchange over one row per partition, the
    # accepted pattern (cf. temperature_rates/bm25); windows and
    # Python are what must stay out of the corpus-sized path.
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- train_quality_classifier ---------------------------------------------------


def test_classifier_train_learns_separating_weights(spark):
    from tspider_spark.operators.classify import train_quality_classifier

    # bucket 1 appears only in positive docs, bucket 2 only in
    # negatives, bucket 3 in both: after training w1 > 0 > w2 and
    # |w3| is comparatively small
    feats = spark.createDataFrame(
        [(1, 1, 2.0), (1, 3, 1.0), (2, 1, 1.0), (2, 3, 1.0),
         (3, 2, 2.0), (3, 3, 1.0), (4, 2, 1.0), (4, 3, 1.0)],
        "doc_id long, bucket int, cnt double",
    )
    labels = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 0.0), (4, 0.0)], "doc_id long, y double"
    )
    w = {
        r["bucket"]: r["weight"]
        for r in train_quality_classifier(feats, labels, iters=5).collect()
    }
    assert w[1] > 0 > w[2]
    assert abs(w[3]) < min(abs(w[1]), abs(w[2]))


def test_classifier_train_deterministic_across_runs_and_partitions(spark):
    from tspider_spark.operators.classify import train_quality_classifier

    feats = spark.createDataFrame(
        [(i, i % 7, float((i % 3) + 1)) for i in range(60)],
        "doc_id long, bucket int, cnt double",
    )
    labels = spark.createDataFrame(
        [(i, float(i % 2)) for i in range(60)], "doc_id long, y double"
    )
    a = train_quality_classifier(feats, labels, iters=4).collect()
    b = train_quality_classifier(
        feats.repartition(13), labels.repartition(7), iters=4
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_classifier_train_plan_no_windows_no_python(spark):
    from tspider_spark.operators.classify import train_quality_classifier

    feats = spark.createDataFrame(
        [(1, 1, 1.0)], "doc_id long, bucket int, cnt double"
    )
    labels = spark.createDataFrame([(1, 1.0)], "doc_id long, y double")
    plan = (
        train_quality_classifier(feats, labels, iters=1)
        ._jdf.queryExecution()
        .toString()
    )
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- kcore ---------------------------------------------------------------------


def test_kcore_recovers_planted_clique(spark):
    from tspider_spark.operators.graph import kcore

    # 5-clique (degree 4 inside) + a pendant path hanging off it:
    # 3-core must peel the path and keep exactly the clique
    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    path = [(4, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + path, "src long, dst long")
    out = {r["node"]: r["core_degree"] for r in kcore(edges, k=3, rounds=6).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert all(d == 4 for d in out.values())


def test_kcore_k_too_large_empties_graph(spark):
    from tspider_spark.operators.graph import kcore

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(clique, "src long, dst long")
    assert kcore(edges, k=4, rounds=4).count() == 0


def test_kcore_cascade_needs_multiple_rounds(spark):
    from tspider_spark.operators.graph import kcore

    # chain 0-1-2-3-4: 2-core is empty but peeling proceeds one
    # endpoint-pair per round — rounds=1 must NOT yet be the fixpoint
    chain = [(i, i + 1) for i in range(4)]
    edges = spark.createDataFrame(chain, "src long, dst long")
    assert kcore(edges, k=2, rounds=1).count() > 0
    assert kcore(edges, k=2, rounds=3).count() == 0


# --- classifier_pr_curve --------------------------------------------------------


def test_pr_curve_confusion_counts(spark):
    from tspider_spark.operators.classify import classifier_pr_curve

    # weights fixed by hand: bucket 1 weight +2, bucket 2 weight -2
    feats = spark.createDataFrame(
        [(1, 1, 1.0), (2, 1, 1.0), (3, 2, 1.0), (4, 2, 1.0)],
        "doc_id long, bucket int, cnt double",
    )
    labels = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, 0.0), (4, 1.0)], "doc_id long, y double"
    )
    weights = spark.createDataFrame(
        [(1, 2.0), (2, -2.0)], "bucket int, weight double"
    )
    out = {
        r["threshold"]: r
        for r in classifier_pr_curve(
            feats, labels, weights, thresholds=(0.5,)
        ).collect()
    }
    r = out[0.5]
    # docs 1,2 score sigmoid(2)≈0.88 -> predicted positive; docs 3,4
    # score sigmoid(-2)≈0.12 -> negative. y: 1,0,0,1.
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 1, 1, 1)
    assert r["precision"] == 0.5 and r["recall"] == 0.5


def test_pr_curve_extreme_thresholds(spark):
    from tspider_spark.operators.classify import classifier_pr_curve

    feats = spark.createDataFrame(
        [(1, 1, 1.0), (2, 1, 1.0)], "doc_id long, bucket int, cnt double"
    )
    labels = spark.createDataFrame(
        [(1, 1.0), (2, 0.0)], "doc_id long, y double"
    )
    weights = spark.createDataFrame([(1, 1.0)], "bucket int, weight double")
    out = {
        r["threshold"]: r
        for r in classifier_pr_curve(
            feats, labels, weights, thresholds=(0.0, 1.0)
        ).collect()
    }
    # t=0: everything positive -> recall 1; t=1: nothing positive
    # (sigmoid < 1) -> precision NULL, recall 0
    assert out[0.0]["recall"] == 1.0 and out[0.0]["fn"] == 0
    assert out[1.0]["tp"] == 0 and out[1.0]["precision"] is None
    assert out[1.0]["recall"] == 0.0


# --- HLL sketch ----------------------------------------------------------------


def test_hll_estimate_within_expected_error(spark):
    from tspider_spark.operators.sketch import hll_cardinality

    # 2000 distinct urls in one group, each duplicated 3x: estimate
    # must ignore duplicates and land within ~4 sigma of 13%/sqrt(1)
    rows = [("h", f"http://h/p/{i}") for i in range(2000)] * 3
    df = spark.createDataFrame(rows, "hostname string, url string")
    out = hll_cardinality(df, b=6, with_exact=True).collect()[0]
    assert out["n_exact"] == 2000
    assert abs(out["rel_err"]) < 0.5


def test_hll_registers_merge_across_shards(spark):
    from tspider_spark.operators.sketch import hll_registers, hll_cardinality
    from pyspark.sql import functions as SF

    rows = [("h", f"u{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "hostname string, url string")
    half1 = df.filter(SF.length("url") % 2 == 0)
    half2 = df.filter(SF.length("url") % 2 == 1)
    merged = (
        hll_registers(half1)
        .unionByName(hll_registers(half2))
        .groupBy("grp", "reg")
        .agg(SF.max("rho").alias("rho"))
    )
    whole = hll_registers(df)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_small_range_linear_counting(spark):
    from tspider_spark.operators.sketch import hll_cardinality

    # 5 distinct items over 64 registers -> small-range branch; linear
    # counting is near-exact at this load factor
    rows = [("h", f"u{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "hostname string, url string")
    out = hll_cardinality(df, b=6, with_exact=True).collect()[0]
    assert out["n_exact"] == 5
    assert abs(out["n_hll"] - 5) < 1.0


def test_hll_register_state_bounded(spark):
    from tspider_spark.operators.sketch import hll_registers

    rows = [("h", f"u{i}") for i in range(10000)]
    df = spark.createDataFrame(rows, "hostname string, url string")
    assert hll_registers(df, b=6).count() <= 64


# --- count-min sketch ------------------------------------------------------------


def test_cms_never_underestimates_and_is_tight_when_wide(spark):
    from tspider_spark.operators.sketch import cms_top_k

    rows = [(f"u{i % 20}",) for i in range(400)] + [("hot",)] * 100
    df = spark.createDataFrame(rows, "url string")
    out = {r["item"]: r for r in cms_top_k(df, k=5, d=4, w=1024).collect()}
    assert out["hot"]["n_exact"] == 100
    for r in out.values():
        assert r["n_cms"] >= r["n_exact"]
    # at w=1024 with 21 distinct items collisions are ~impossible
    assert out["hot"]["n_cms"] == 100


def test_cms_tables_merge_by_sum(spark):
    from tspider_spark.operators.sketch import cms_table
    from pyspark.sql import functions as SF

    rows = [(i, f"u{i % 13}") for i in range(300)]
    df = spark.createDataFrame(rows, "i long, url string")
    a = df.filter(F.col("i") < 150)
    b = df.filter(F.col("i") >= 150)
    merged = (
        cms_table(a)
        .unionByName(cms_table(b))
        .groupBy("row", "bucket")
        .agg(SF.sum("cnt").cast("long").alias("cnt"))
    )
    whole = cms_table(df)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_state_bounded_at_d_times_w(spark):
    from tspider_spark.operators.sketch import cms_table

    rows = [(f"u{i}",) for i in range(5000)]
    df = spark.createDataFrame(rows, "url string")
    assert cms_table(df, d=3, w=64).count() <= 3 * 64


# --- hll_overlap (sketch set algebra) ---------------------------------------


def test_hll_overlap_disjoint_and_identical_sets(spark):
    from pyspark.sql import functions as F

    from tspider_spark.operators.sketch import hll_overlap

    rows = (
        [("a", f"x{i}") for i in range(40)]
        + [("b", f"x{i}") for i in range(40)]      # b == a
        + [("c", f"y{i}") for i in range(40)]      # c disjoint from both
    )
    df = spark.createDataFrame(rows, "grp string, item string")
    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in hll_overlap(df, "grp", "item", b=6).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    # identical sets: union estimate == each side, intersection == side
    assert ab["n_union"] == ab["n_a"] == ab["n_b"]
    assert ab["n_inter"] == ab["n_a"]
    # disjoint sets: intersection estimate near 0 (sketch noise only,
    # clamped at >= 0), union >= max side
    ac = out[("a", "c")]
    assert ac["n_inter"] <= 0.25 * ac["n_a"]
    assert ac["n_union"] >= max(ac["n_a"], ac["n_c"] if "n_c" in ac else 0)


def test_hll_overlap_partial(spark):
    from tspider_spark.operators.sketch import hll_overlap

    # 30 shared + 30 exclusive each side: true |inter| = 30
    rows = (
        [("p", f"s{i}") for i in range(30)]
        + [("p", f"p{i}") for i in range(30)]
        + [("q", f"s{i}") for i in range(30)]
        + [("q", f"q{i}") for i in range(30)]
    )
    df = spark.createDataFrame(rows, "grp string, item string")
    r = hll_overlap(df, "grp", "item", b=8).collect()[0]
    # b=8 (m=256): linear-counting regime, tight estimates
    assert 15 <= r["n_inter"] <= 45
    assert 45 <= r["n_a"] <= 75
