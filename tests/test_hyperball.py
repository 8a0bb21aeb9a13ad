"""HyperBall: HLL-sketched neighborhood function / harmonic centrality
— growth semantics on known graphs and bit-exact oracle replay."""

from __future__ import annotations

import duckdb
import pytest

from tspider_spark.operators.graph import hyperball, hyperball_oracle_sql


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _run(spark, pairs, radius, b=6):
    return {
        r["node"]: (r["ball"], r["harmonic"])
        for r in hyperball(_edges(spark, pairs), radius=radius, b=b).collect()
    }


def test_path_graph_ball_growth_and_sinks(spark):
    # a -> b -> c -> d: a's ball keeps growing until the path is
    # exhausted; d has no out-edges so its ball never leaves {d}.
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    r1 = _run(spark, pairs, radius=1)
    r3 = _run(spark, pairs, radius=3)
    assert r3["a"][0] > r1["a"][0] > 0
    assert r1["d"][0] == r3["d"][0]  # sink: estimate frozen at {d}
    assert r3["d"][1] == 0.0  # harmonic of a sink is exactly 0
    # harmonic decays along the path: a reaches 3 nodes (1 + 1/2 +
    # 1/3 weighted), b reaches 2, c reaches 1
    assert r3["a"][1] > r3["b"][1] > r3["c"][1] > 0


def test_ball_estimates_are_monotone_in_radius(spark):
    # estimates are HLL unions: registers only grow, so the estimate
    # is non-decreasing in t for EVERY node (exact property, not
    # approximate)
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "e")]
    prev = None
    for radius in (1, 2, 3, 4):
        cur = _run(spark, pairs, radius=radius)
        if prev is not None:
            assert all(cur[n][0] >= prev[n][0] - 1e-9 for n in cur)
        prev = cur


def test_radius_validation(spark):
    with pytest.raises(ValueError):
        hyperball(_edges(spark, [("a", "b")]), radius=0)


def test_oracle_replays_registers_bit_for_bit(spark, tmp_path):
    # ring + chords: collisions at b=4 (m=16) are likely, which is the
    # point — the oracle must reproduce the COLLIDED estimates exactly
    pairs = [(f"n{i}", f"n{(i + 1) % 12}") for i in range(12)]
    pairs += [(f"n{i}", f"n{(i + 5) % 12}") for i in range(0, 12, 3)]
    _edges(spark, pairs).write.parquet(str(tmp_path / "e"))
    edges = spark.read.parquet(str(tmp_path / "e"))
    got = sorted(map(tuple, hyperball(edges, radius=4, b=4).collect()))
    con = duckdb.connect()
    sql = hyperball_oracle_sql(
        f"edges as (select src, dst from '{tmp_path / 'e'}/*.parquet')",
        radius=4, b=4,
    )
    assert got == sorted(con.execute(sql).fetchall())


def test_distances_on_path_graph(spark):
    from tspider_spark.operators.graph import hyperball_distances

    # a -> b -> c: N(t) grows then saturates; frac hits 1.0 at the end
    out = {
        r["t"]: r
        for r in hyperball_distances(
            _edges(spark, [("a", "b"), ("b", "c")]), radius=3, b=6
        ).collect()
    }
    assert len(out) == 4
    assert out[0]["neighborhood"] < out[1]["neighborhood"]
    assert out[2]["neighborhood"] == out[3]["neighborhood"]  # saturated
    assert out[3]["reach_frac"] == 1.0 and out[3]["delta"] == 0.0
    # eff_diameter is a single consistent value within [0, radius]
    eds = {r["eff_diameter"] for r in out.values()}
    assert len(eds) == 1
    ed = eds.pop()
    assert 0.0 <= ed <= 3.0


def test_distances_oracle_parity(spark, tmp_path):
    from tspider_spark.operators.graph import (
        hyperball_distances,
        hyperball_distances_oracle_sql,
    )

    pairs = [(f"n{i}", f"n{(i + 1) % 9}") for i in range(9)]
    pairs += [("n0", "n4"), ("n2", "n7")]
    _edges(spark, pairs).write.parquet(str(tmp_path / "e"))
    edges = spark.read.parquet(str(tmp_path / "e"))
    got = sorted(
        map(tuple, hyperball_distances(edges, radius=5, b=4).collect())
    )
    con = duckdb.connect()
    sql = hyperball_distances_oracle_sql(
        f"edges as (select src, dst from '{tmp_path / 'e'}/*.parquet')",
        radius=5, b=4,
    )
    assert got == sorted(con.execute(sql).fetchall())


def test_hyperball_eval_exact_side_on_path_graph(spark):
    # a -> b -> c -> d: bounded-radius EXACT harmonic is
    # a: 1 + 1/2 + 1/3, b: 1 + 1/2, c: 1, d: 0 — the closure side
    # must be exact regardless of sketch noise, and abs_err must be
    # |est - exact| of the hyperball estimate for the same b
    from tspider_spark.operators.graph import hyperball, hyperball_eval

    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    out = {
        r["node"]: r
        for r in hyperball_eval(
            _edges(spark, pairs), radius=3, b=6
        ).collect()
    }
    assert out["a"]["harmonic_exact"] == round(1 + 1 / 2 + 1 / 3, 6)
    assert out["b"]["harmonic_exact"] == 1.5
    assert out["c"]["harmonic_exact"] == 1.0
    assert out["d"]["harmonic_exact"] == 0.0
    est = {
        r["node"]: r["harmonic"]
        for r in hyperball(_edges(spark, pairs), radius=3, b=6).collect()
    }
    for n, row in out.items():
        assert row["abs_err"] == round(
            abs(est[n] - row["harmonic_exact"]), 6
        )
