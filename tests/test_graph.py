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
