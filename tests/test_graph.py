"""Host-graph PageRank: closed-form pins, dangling-mass conservation,
and agreement with an independent numpy power iteration."""

from __future__ import annotations

import pytest

from tspider_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_cycle_is_uniform(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iters=5).collect()}
    assert ranks == {"a": 0.333333, "b": 0.333333, "c": 0.333333}


def test_dangling_mass_is_conserved(spark):
    # b has no out-edges; its rank must recirculate, total staying 1
    e = _edges(spark, [("a", "b")])
    rows = pagerank(e, iters=8).collect()
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-5
    ranks = {r["node"]: r["rank"] for r in rows}
    assert ranks["b"] > ranks["a"]  # a's full vote goes to b


def test_matches_numpy_power_iteration(spark):
    import numpy as np

    nodes = [f"n{i}" for i in range(8)]
    pairs = [
        (nodes[i], nodes[(i * 3 + j) % 8])
        for i in range(8)
        for j in (1, 2)
        if i != (i * 3 + j) % 8
    ]
    iters, d = 10, 0.85
    got = {r["node"]: r["rank"] for r in pagerank(_edges(spark, pairs), iters=iters).collect()}

    idx = {n: i for i, n in enumerate(nodes)}
    out = {}
    for s, t in set(pairs):
        out.setdefault(s, []).append(t)
    n = len(nodes)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        dangling = sum(r[idx[v]] for v in nodes if v not in out)
        nxt += d * dangling / n
        for s, ts in out.items():
            for t in ts:
                nxt[idx[t]] += d * r[idx[s]] / len(ts)
        r = nxt
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], abs=2e-6)


# ---------------------------------------------------------------------------
# connected components (large-star / small-star)


def _cc_frames(spark, n, edge_pairs):
    ids = spark.createDataFrame([(f"d{i:04d}",) for i in range(n)], "doc_id string")
    pairs = spark.createDataFrame(edge_pairs, "ia string, ib string")
    return ids, pairs


def test_opic_cycle_is_uniform(spark):
    from tspider_spark.operators.graph import opic

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    got = {r["node"]: r["importance"] for r in opic(e, rounds=5).collect()}
    assert got == {"a": 0.333333, "b": 0.333333, "c": 0.333333}


def test_opic_importance_sums_to_one_and_matches_numpy(spark):
    # cash is conserved through dangling redistribution, and the
    # Cesàro average matches an independent numpy simulation
    import numpy as np

    from tspider_spark.operators.graph import opic

    nodes = [f"n{i}" for i in range(8)]
    pairs = [
        (nodes[i], nodes[(i * 3 + j) % 8])
        for i in range(8)
        for j in (1, 2)
        if i != (i * 3 + j) % 8
    ]
    # drop n1's out-edges so the graph has a dangling node
    pairs = [p for p in pairs if p[0] != "n1"]
    rounds = 7
    rows = opic(_edges(spark, pairs), rounds=rounds).collect()
    got = {r["node"]: r["importance"] for r in rows}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)

    present = sorted({s for s, _ in pairs} | {t for _, t in pairs})
    idx = {n: i for i, n in enumerate(present)}
    out = {}
    for s, t in set(pairs):
        out.setdefault(s, []).append(t)
    n = len(present)
    cash = np.full(n, 1.0 / n)
    hist = np.zeros(n)
    for _ in range(rounds):
        nxt = np.zeros(n)
        dangling = sum(cash[idx[v]] for v in present if v not in out)
        nxt += dangling / n
        for s, ts in out.items():
            for t in ts:
                nxt[idx[t]] += cash[idx[s]] / len(ts)
        hist += cash
        cash = nxt
    imp = (hist + cash) / (rounds + 1)
    for v in present:
        assert got[v] == pytest.approx(imp[idx[v]], abs=2e-6)


def test_cc_star_matches_hash_min_on_random_graphs(spark):
    """The two clustering paths must be interchangeable: identical
    (id, cluster_id, keep) on seeded random graphs, including ones with
    a giant high-diameter component (where hash-min needs ~60 rounds
    and star contraction needs ~12)."""
    import random

    from tspider_spark.operators.graph import connected_components
    from tspider_spark.operators.textdedup import dedup_clusters

    for seed, n, m in ((7, 200, 150), (11, 120, 40)):
        random.seed(seed)
        edges = [
            (f"d{random.randrange(n):04d}", f"d{random.randrange(n):04d}")
            for _ in range(m)
        ]
        ids, pairs = _cc_frames(spark, n, edges)
        pairs = pairs.filter("ia != ib")
        a = connected_components(ids, pairs, max_iter=15).orderBy("doc_id").collect()
        b = dedup_clusters(ids, pairs, max_iter=80).orderBy("doc_id").collect()
        assert a == b


def test_cc_star_logarithmic_rounds_on_path_graph(spark):
    """A 64-node path has diameter 63: hash-min label propagation needs
    63 rounds, star contraction must collapse it within 10 — the
    O(log n) claim, pinned as a hard bound."""
    from tspider_spark.operators.graph import connected_components

    ids = spark.createDataFrame(
        [(f"p{i:03d}",) for i in range(64)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [(f"p{i:03d}", f"p{i+1:03d}") for i in range(63)], "ia string, ib string"
    )
    rows = connected_components(ids, pairs, max_iter=10).collect()
    assert all(r["cluster_id"] == "p000" for r in rows)
    assert sum(r["keep"] for r in rows) == 1


def test_cc_star_singletons_and_empty_edges(spark):
    from tspider_spark.operators.graph import connected_components

    ids, pairs = _cc_frames(spark, 5, [("d0001", "d0002")])
    rows = {
        r["doc_id"]: r
        for r in connected_components(ids, pairs).collect()
    }
    assert rows["d0002"]["cluster_id"] == "d0001" and not rows["d0002"]["keep"]
    for d in ("d0000", "d0003", "d0004"):
        assert rows[d]["cluster_id"] == d and rows[d]["keep"]
    empty = connected_components(ids, pairs.limit(0)).collect()
    assert all(r["keep"] and r["cluster_id"] == r["doc_id"] for r in empty)


def test_trustrank_spam_island_gets_zero(spark):
    """Trust only flows from the seed set: a densely-interlinked farm
    no trusted host points at ends with exactly zero trust, however
    it links to itself or to trusted regions."""
    from tspider_spark.operators.graph import trustrank

    e = _edges(
        spark,
        [
            ("a", "b"), ("b", "a"),          # trusted region
            ("spam1", "spam2"), ("spam2", "spam1"),  # farm
            ("spam1", "a"),                  # farm links INTO trust
        ],
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["trust"] for r in trustrank(e, seeds, iters=8).collect()}
    assert got["spam1"] == 0.0 and got["spam2"] == 0.0
    assert got["a"] > 0 and got["b"] > 0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)


def test_trustrank_dangling_mass_teleports_to_seeds(spark):
    # b is dangling; its trust must flow back to the seed, not leak
    from tspider_spark.operators.graph import trustrank

    e = _edges(spark, [("a", "b")])
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["trust"] for r in trustrank(e, seeds, iters=6).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)
    assert got["a"] > got["b"] > 0


def test_trustrank_uniform_seeds_equals_pagerank(spark):
    """With EVERY node in the seed set, TrustRank's personalization is
    uniform — it must equal plain PageRank (same damping, same
    dangling redistribution) on any graph."""
    from tspider_spark.operators.graph import pagerank, trustrank

    pairs = [(f"n{i}", f"n{(i * 3 + j) % 7}") for i in range(7) for j in (1, 2)]
    pairs = [p for p in pairs if p[0] != p[1] and p[0] != "n2"]  # n2 dangling
    e = _edges(spark, pairs)
    nodes = sorted({x for p in pairs for x in p})
    seeds = spark.createDataFrame([(n,) for n in nodes], "node string")
    tr = {r["node"]: r["trust"] for r in trustrank(e, seeds, iters=7).collect()}
    pr = {r["node"]: r["rank"] for r in pagerank(e, iters=7).collect()}
    assert tr == pr


def test_neighbor_jaccard_cocitation(spark):
    from tspider_spark.operators.graph import neighbor_jaccard_pairs

    edges = spark.createDataFrame(
        [("s1", "a"), ("s1", "b"), ("s1", "c"),
         ("s2", "a"), ("s2", "b"),
         ("s3", "b"), ("s3", "c"),
         ("s4", "a"),
         ("s2", "a")],  # duplicate edge must not double-count
        ["src", "dst"],
    )
    got = {
        (r.ia, r.ib, r.shared, r.jaccard)
        for r in neighbor_jaccard_pairs(edges, "cocitation", min_shared=2).collect()
    }
    assert got == {("a", "b", 2, 0.5), ("b", "c", 2, 0.666667)}

    # coupling on reversed edges == cocitation on the originals
    rev = edges.select(
        edges.dst.alias("src"), edges.src.alias("dst")
    )
    got2 = {
        (r.ia, r.ib, r.shared, r.jaccard)
        for r in neighbor_jaccard_pairs(rev, "coupling", min_shared=2).collect()
    }
    assert got2 == got


def test_neighbor_jaccard_degree_cap(spark):
    from tspider_spark.operators.graph import neighbor_jaccard_pairs

    edges = spark.createDataFrame(
        [("s1", "a"), ("s1", "b"), ("s1", "c"),
         ("s2", "a"), ("s2", "b"),
         ("s3", "b"), ("s3", "c"),
         ("s4", "a")],
        ["src", "dst"],
    )
    # s1 (fan-out 3) is a super-connector: excluded at max_degree=2,
    # and the per-item set sizes shrink consistently
    got = {
        (r.ia, r.ib, r.shared, r.jaccard)
        for r in neighbor_jaccard_pairs(
            edges, "cocitation", min_shared=1, max_degree=2
        ).collect()
    }
    assert got == {("a", "b", 1, 0.333333), ("b", "c", 1, 0.5)}


def test_salsa_degree_normalization_kills_tkc(spark):
    """On a graph where one hub links to everything, HITS
    concentrates authority on the hub's targets while SALSA's
    degree-normalized walk spreads it: the mega-hub's per-target
    contribution is 1/outdeg. Invariants: scores sum to ~1 per side,
    and a node endorsed by TWO selective hubs outranks one endorsed
    only by the mega-hub."""
    from tspider_spark.operators.graph import salsa

    edges = []
    # mega-hub m links to t0..t9 (shotgun)
    edges += [("m", f"t{i}") for i in range(10)]
    # two selective hubs each link ONLY to t0 (plus one filler each)
    edges += [("s1", "t0"), ("s2", "t0"), ("s1", "f1"), ("s2", "f2")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["node"]: r for r in salsa(df, iters=12).collect()}
    auth_sum = sum(r["salsa_authority"] for r in out.values())
    hub_sum = sum(r["salsa_hub"] for r in out.values())
    assert abs(auth_sum - 1.0) < 1e-4 and abs(hub_sum - 1.0) < 1e-4
    # t0: 1/10 of m's mass + 1/2 of s1 + 1/2 of s2 >> t1: 1/10 of m
    assert out["t0"]["salsa_authority"] > 3 * out["t1"]["salsa_authority"]
    # the selective hubs beat nothing-hubs but the mega-hub still
    # hubs hardest (it reaches the most authority mass)
    assert out["m"]["salsa_hub"] > out["s1"]["salsa_hub"] > 0
