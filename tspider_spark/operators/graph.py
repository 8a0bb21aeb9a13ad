"""Host-graph authority scoring: distributed PageRank (Page et al.
1999) over the crawl's host link graph.

A production crawler prioritizes its frontier by host authority
(OPIC/PageRank-style scores are standard in large-scale crawl
schedulers); the reference's FIFO queue has no analog, so this is a
§2.8 extension feeding the same admission fold (join the scores onto
the frontier and order by (depth, -rank, discovery_order)).

Scale design — every iteration is one shuffle keyed on the node id:

- contributions: edges ⋈ ranks on src (both sides hash-partitioned on
  the join key; AQE handles hot-host skew), then groupBy(dst) with
  map-side partial sums.
- the graph-size scalar N and per-iteration dangling mass are carried
  as broadcast 1-row cross joins (the BM25 pattern) — no driver-side
  ``collect``/scalars, so the whole loop is one lazy plan per
  iteration.
- iterative lineage: each iteration ends with an eager
  ``localCheckpoint`` cutting the ranks lineage. This is not optional
  polish: one iteration references rank_t TWICE (contributions and
  dangling mass), so an uncut plan grows ~3^k — measured 308 s for 10
  iterations on a 37-node graph without the cut vs ~20 s with it (all
  driver-side analysis, not executor work). ``checkpoint_every`` > 1
  trades driver analysis for fewer materializations; 1 is right for
  any deep loop.

Semantics (pinned by tests + the chained-CTE DuckDB oracle):
rank_0 = 1/N; rank_{t+1}(v) = (1-d)/N + d * (sum over in-neighbors u
of rank_t(u)/outdeg(u) + dangling_t/N) where dangling_t is the total
rank of nodes with no out-edges (redistributed uniformly). Ranks sum
to 1 at every iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """PageRank over the distinct directed edge set. Returns
    (node, rank) for every node appearing as source or target,
    rank rounded to 6 places."""
    # Materialize the loop-invariant relations ONCE: e feeds a join
    # every iteration and base two — left as lazy plans they re-run
    # the whole upstream edge derivation (documents scan + span
    # explode + distinct) each round, which dominates the loop cost.
    e = edges.select(src, dst).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_row = nodes.agg(F.count("*").alias("_n"))  # 1 row, broadcast below
    deg = e.groupBy(F.col(src).alias("node")).agg(F.count("*").alias("_deg"))

    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    # deg joined once onto the rank table so each iteration reuses it
    base = (
        nodes.join(deg, "node", "left")
        .crossJoin(F.broadcast(n_row))
        .localCheckpoint(eager=True)
    )

    for i in range(iters):
        r = base.join(ranks, "node")
        contrib = (
            r.filter(F.col("_deg").isNotNull())
            .join(e, F.col("node") == F.col(src))
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_c"))
        )
        dangling = r.agg(
            F.coalesce(
                F.sum(F.when(F.col("_deg").isNull(), F.col("rank"))), F.lit(0.0)
            ).alias("_dm")
        )
        ranks = (
            base.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("_n")
                    + damping
                    * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_dm") / F.col("_n"))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def hits(
    edges: DataFrame,
    iters: int = 10,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the distinct
    directed edge set — the complement of :func:`pagerank` for frontier
    prioritization: PageRank surfaces endorsed hosts, HITS separates
    *directories* (hubs: link to many good pages — where a crawler
    harvests the most new URLs per fetch) from *content* (authorities).

    Iteration (L1-normalized, pinned by the chained-CTE oracle):
    auth_{t+1}(v) = Σ_{u→v} hub_t(u), normalized to sum 1;
    hub_{t+1}(u) = Σ_{u→v} auth_{t+1}(v), normalized to sum 1.
    hub_0 = 1/N. Nodes without in-edges get authority 0, without
    out-edges hub 0 (scores stay defined for every node).

    Scale shape mirrors :func:`pagerank`: each half-step is ONE shuffle
    keyed on a node id (edges ⋈ scores with map-side partial sums), the
    normalizer is a broadcast 1-row cross join (never a driver scalar),
    and lineage is cut per iteration — each iteration references the
    previous scores twice (contribution + normalizer), so an uncut plan
    grows exponentially exactly like the PageRank loop measured at
    308 s → 10 s.

    Returns (node, hub, authority), both rounded to 6 places.
    """
    if iters < 1:
        raise ValueError("hits needs iters >= 1")
    # e and nodes each feed TWO joins per iteration — materialize once
    # (see the pagerank comment; same loop-invariant argument)
    e = edges.select(src, dst).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_row = nodes.agg(F.count("*").alias("_n"))
    hub = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("hub")
    )
    auth = None
    for i in range(iters):
        a_raw = (
            hub.join(e, hub["node"] == F.col(src))
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum("hub").alias("_a"))
        )
        a_sum = a_raw.agg(F.sum("_a").alias("_s"))
        auth = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_sum))
            .select(
                "node",
                (F.coalesce(F.col("_a"), F.lit(0.0)) / F.col("_s")).alias("auth"),
            )
        )
        h_raw = (
            auth.join(e, auth["node"] == F.col(dst))
            .groupBy(F.col(src).alias("node"))
            .agg(F.sum("auth").alias("_h"))
        )
        h_sum = h_raw.agg(F.sum("_h").alias("_s"))
        hub = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_sum))
            .select(
                "node",
                (F.coalesce(F.col("_h"), F.lit(0.0)) / F.col("_s")).alias("hub"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            # cutting HUB alone bounds the growth: the next iteration's
            # auth derives from this checkpoint, so auth's plan is
            # always <= 2 join/agg levels above a leaf — checkpointing
            # it too would double the materializations for nothing
            hub = hub.localCheckpoint(eager=True)
    return hub.join(auth, "node").select(
        "node",
        F.round("hub", 6).alias("hub"),
        F.round("auth", 6).alias("authority"),
    )


def hits_oracle_sql(edges_cte: str, iters: int = 10) -> str:
    """Chained-CTE SQL twin of :func:`hits` (same shape as
    :func:`pagerank_oracle_sql`; every score CTE is MATERIALIZED
    because each is referenced twice — contribution + normalizer)."""
    parts = [
        edges_cte,
        "e as (select distinct src, dst from edges)",
        "nodes as (select src as node from e union select dst from e)",
        "nn as (select count(*) as n from nodes)",
        "h0 as materialized "
        "(select node, cast(1.0 as double) / nn.n as hub from nodes, nn)",
    ]
    for t in range(iters):
        parts.append(
            f"ar{t} as materialized (select e.dst as node, sum(h.hub) as a "
            f"from h{t} h join e on e.src = h.node group by 1)"
        )
        parts.append(f"asum{t} as (select sum(a) as s from ar{t})")
        parts.append(
            f"a{t + 1} as materialized (select n.node, "
            f"coalesce(ar{t}.a, cast(0 as double)) / asum{t}.s as auth "
            f"from nodes n left join ar{t} on n.node = ar{t}.node, asum{t})"
        )
        parts.append(
            f"hr{t} as materialized (select e.src as node, sum(a.auth) as h "
            f"from a{t + 1} a join e on e.dst = a.node group by 1)"
        )
        parts.append(f"hsum{t} as (select sum(h) as s from hr{t})")
        parts.append(
            f"h{t + 1} as materialized (select n.node, "
            f"coalesce(hr{t}.h, cast(0 as double)) / hsum{t}.s as hub "
            f"from nodes n left join hr{t} on n.node = hr{t}.node, hsum{t})"
        )
    return (
        "with " + ",\n ".join(parts)
        + f"\n select h.node, round(h.hub, 6) as hub,"
        f" round(a.auth, 6) as authority"
        f" from h{iters} h join a{iters} a on h.node = a.node"
    )


def salsa(
    edges: DataFrame,
    iters: int = 10,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """SALSA (Lempel & Moran 2000, "Stochastic Approach for
    Link-Structure Analysis") — the random-walk variant of HITS that
    TREC-era web search actually preferred: contributions are
    DEGREE-NORMALIZED (each node splits its mass equally over its
    links), so a single high-degree hub cannot dominate the way it
    does under HITS's raw sums — the tightly-knit-community (TKC)
    effect SALSA was designed to kill. The crawl-scheduler reading:
    HITS finds the big directories, SALSA finds the *proportionally*
    best-endorsed hosts; the pair disagreeing on a host is itself a
    link-farm signal.

    Iteration (L1-renormalized each half-step, pinned by the oracle):
    a_{t+1}(v) = Σ_{u→v} h_t(u)/outdeg(u), renormalized to sum 1
    (mass reaching dangling-free nodes; the renorm makes dangling
    loss explicit and deterministic); h_{t+1}(u) = Σ_{u→v}
    a_{t+1}(v)/indeg(v), renormalized. h_0 = 1/|V|.

    Scale shape is :func:`hits`'s exactly: one node-keyed exchange
    per half-step (the degree tables are node-sized and co-keyed with
    the score join), normalizers are broadcast 1-row cross joins,
    lineage cut per iteration, loop-invariant e/nodes/degree tables
    materialized once. Returns (node, salsa_hub, salsa_authority),
    rounded to 6.
    """
    if iters < 1:
        raise ValueError("salsa needs iters >= 1")
    e = edges.select(src, dst).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dout = e.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("_dout")
    )
    din = e.groupBy(F.col(dst).alias("node")).agg(F.count("*").alias("_din"))
    n_row = nodes.agg(F.count("*").alias("_n"))
    hub = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("hub")
    )
    auth = None
    for i in range(iters):
        a_raw = (
            hub.join(dout, "node")
            .join(e, F.col("node") == F.col(src))
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum(F.col("hub") / F.col("_dout")).alias("_a"))
        )
        a_sum = a_raw.agg(F.sum("_a").alias("_s"))
        auth = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_sum))
            .select(
                "node",
                (F.coalesce(F.col("_a"), F.lit(0.0)) / F.col("_s")).alias(
                    "auth"
                ),
            )
        )
        h_raw = (
            auth.join(din, "node")
            .join(e, F.col("node") == F.col(dst))
            .groupBy(F.col(src).alias("node"))
            .agg(F.sum(F.col("auth") / F.col("_din")).alias("_h"))
        )
        h_sum = h_raw.agg(F.sum("_h").alias("_s"))
        hub = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_sum))
            .select(
                "node",
                (F.coalesce(F.col("_h"), F.lit(0.0)) / F.col("_s")).alias(
                    "hub"
                ),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            hub = hub.localCheckpoint(eager=True)
    return hub.join(auth, "node").select(
        "node",
        F.round("hub", 6).alias("salsa_hub"),
        F.round("auth", 6).alias("salsa_authority"),
    )


def salsa_oracle_sql(edges_cte: str, iters: int = 10) -> str:
    """Chained-CTE SQL twin of :func:`salsa` (the :func:`hits_oracle_sql`
    shape with degree-normalized contributions)."""
    parts = [
        edges_cte,
        "e as materialized (select distinct src, dst from edges)",
        "nodes as (select src as node from e union select dst from e)",
        "nn as (select count(*) as n from nodes)",
        "dout as materialized "
        "(select src as node, count(*) as d from e group by 1)",
        "din as materialized "
        "(select dst as node, count(*) as d from e group by 1)",
        "h0 as materialized "
        "(select node, cast(1.0 as double) / nn.n as hub from nodes, nn)",
    ]
    for t in range(iters):
        parts.append(
            f"ar{t} as materialized (select e.dst as node, "
            f"sum(h.hub / dout.d) as a "
            f"from h{t} h join dout on dout.node = h.node "
            f"join e on e.src = h.node group by 1)"
        )
        parts.append(f"asum{t} as (select sum(a) as s from ar{t})")
        parts.append(
            f"a{t + 1} as materialized (select n.node, "
            f"coalesce(ar{t}.a, cast(0 as double)) / asum{t}.s as auth "
            f"from nodes n left join ar{t} on n.node = ar{t}.node, asum{t})"
        )
        parts.append(
            f"hr{t} as materialized (select e.src as node, "
            f"sum(a.auth / din.d) as h "
            f"from a{t + 1} a join din on din.node = a.node "
            f"join e on e.dst = a.node group by 1)"
        )
        parts.append(f"hsum{t} as (select sum(h) as s from hr{t})")
        parts.append(
            f"h{t + 1} as materialized (select n.node, "
            f"coalesce(hr{t}.h, cast(0 as double)) / hsum{t}.s as hub "
            f"from nodes n left join hr{t} on n.node = hr{t}.node, hsum{t})"
        )
    return (
        "with " + ",\n ".join(parts)
        + f"\n select h.node, round(h.hub, 6) as salsa_hub,"
        f" round(a.auth, 6) as salsa_authority"
        f" from h{iters} h join a{iters} a on h.node = a.node"
    )


def pagerank_oracle_sql(
    edges_cte: str, iters: int = 10, damping: float = 0.85
) -> str:
    """Chained-CTE SQL twin of :func:`pagerank` (no recursive CTE:
    each iteration is a plain SELECT). The ``edges_cte`` must define a
    relation ``edges(src, dst)``; the generated statement is
    ``with <edges_cte>, ... select node, rank``.

    The per-iteration rank CTEs are declared ``AS MATERIALIZED``
    (DuckDB/PostgreSQL syntax): each pr_t is referenced twice
    (contributions + dangling), and DuckDB 1.0 inlines plain CTEs at
    every reference — the Spark-side 3^k lineage blowup exactly
    mirrored in the oracle engine (measured 348 s for 10 iterations on
    a 37-node graph without MATERIALIZED, ~0.1 s with it)."""
    # float literals are cast to double explicitly (DuckDB parses bare
    # numeric literals as DECIMAL — decimal arithmetic would diverge
    # from Spark's double arithmetic before round(6)); (1 - damping) is
    # pre-computed in Python so both engines use the identical double.
    d = f"cast({damping!r} as double)"
    teleport = f"cast({1.0 - damping!r} as double)"
    parts = [
        edges_cte,
        "e as (select distinct src, dst from edges)",
        "nodes as (select src as node from e union select dst from e)",
        "nn as (select count(*) as n from nodes)",
        "deg as (select src as node, count(*) as deg from e group by 1)",
        "pr0 as materialized "
        "(select node, cast(1.0 as double) / nn.n as rank from nodes, nn)",
    ]
    for t in range(iters):
        parts.append(
            f"c{t} as (select e.dst as node, sum(p.rank / deg.deg) as c "
            f"from pr{t} p join deg using (node) join e on e.src = p.node "
            f"group by 1)"
        )
        parts.append(
            f"dm{t} as (select coalesce(sum(p.rank), cast(0 as double)) as dm "
            f"from pr{t} p left join deg using (node) where deg.deg is null)"
        )
        parts.append(
            f"pr{t + 1} as materialized (select n.node, "
            f"{teleport} / nn.n + {d} * "
            f"(coalesce(c{t}.c, cast(0 as double)) + dm{t}.dm / nn.n) as rank "
            f"from nodes n left join c{t} on n.node = c{t}.node, nn, dm{t})"
        )
    return (
        "with " + ",\n ".join(parts)
        + f"\n select node, round(rank, 6) as rank from pr{iters}"
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004):
    personalized PageRank whose teleport distribution is uniform over
    a hand-vetted *trusted seed set* instead of all nodes — trust
    flows out from the seeds along links, so link-spam farms that
    no trusted host points at score ~0 however densely they
    interlink. The crawl-scheduler use is the inverse of the
    authority boost: demote (or budget-cap) hosts whose trust is far
    below their PageRank.

    Semantics (biased-PageRank convention, pinned by the chained-CTE
    oracle): s(v) = 1/|S∩V| on seed nodes, 0 elsewhere;
    t_0 = s;  t_{k+1}(v) = (1-d)·s(v) + d·(Σ_{u→v} t_k(u)/outdeg(u)
    + dangling_k·s(v)) — dangling mass teleports to the SEEDS (not
    uniformly), keeping Σt = 1 per iteration. Seeds not present in
    the graph are ignored.

    Scale shape is :func:`pagerank`'s: one node-keyed exchange per
    iteration, scalar carriers as broadcast 1-row cross joins, the
    seed flag joined once onto the reusable base relation (the seed
    set is metadata-sized next to the graph), lineage cut per
    iteration. Returns (node, trust) rounded to 6 places.
    """
    # loop-invariant e/base materialized once (see pagerank comment)
    e = edges.select(src, dst).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    s = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    flagged = nodes.join(
        s.withColumn("_is_seed", F.lit(1)), "node", "left"
    ).select("node", F.coalesce("_is_seed", F.lit(0)).alias("_is_seed"))
    ns_row = flagged.agg(F.sum("_is_seed").alias("_ns"))
    deg = e.groupBy(F.col(src).alias("node")).agg(F.count("*").alias("_deg"))
    base = (
        flagged.join(deg, "node", "left")
        .crossJoin(F.broadcast(ns_row))
        .localCheckpoint(eager=True)
    )
    s_v = F.col("_is_seed").cast("double") / F.col("_ns")

    trust = base.select("node", s_v.alias("trust"))
    for i in range(iters):
        r = base.join(trust, "node")
        contrib = (
            r.filter(F.col("_deg").isNotNull())
            .join(e, F.col("node") == F.col(src))
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum(F.col("trust") / F.col("_deg")).alias("_c"))
        )
        dangling = r.agg(
            F.coalesce(
                F.sum(F.when(F.col("_deg").isNull(), F.col("trust"))),
                F.lit(0.0),
            ).alias("_dm")
        )
        trust = (
            base.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    (1.0 - damping) * s_v
                    + damping
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.col("_dm") * s_v
                    )
                ).alias("trust"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            trust = trust.localCheckpoint(eager=True)
    return trust.select("node", F.round("trust", 6).alias("trust"))


def trustrank_oracle_sql(
    edges_cte: str, seeds_cte: str, iters: int = 10, damping: float = 0.85
) -> str:
    """Chained-CTE SQL twin of :func:`trustrank`. ``edges_cte``
    defines ``edges(src, dst)``; ``seeds_cte`` defines
    ``seeds(node)``. MATERIALIZED per-iteration CTEs for the same
    3^k-inlining reason as :func:`pagerank_oracle_sql`."""
    d = f"cast({damping!r} as double)"
    tele = f"cast({1.0 - damping!r} as double)"
    parts = [
        edges_cte,
        seeds_cte,
        "e as (select distinct src, dst from edges)",
        "nodes as (select src as node from e union select dst from e)",
        "sflag as (select n.node, case when s.node is null then 0 else 1 "
        "end as is_seed from nodes n left join (select distinct node from "
        "seeds) s on n.node = s.node)",
        "ns as (select sum(is_seed) as k from sflag)",
        "deg as (select src as node, count(*) as deg from e group by 1)",
        "t0 as materialized (select node, "
        "cast(is_seed as double) / ns.k as trust from sflag, ns)",
    ]
    for t in range(iters):
        parts.append(
            f"c{t} as (select e.dst as node, sum(p.trust / deg.deg) as c "
            f"from t{t} p join deg using (node) join e on e.src = p.node "
            f"group by 1)"
        )
        parts.append(
            f"dm{t} as (select coalesce(sum(p.trust), cast(0 as double)) "
            f"as dm from t{t} p left join deg using (node) "
            f"where deg.deg is null)"
        )
        parts.append(
            f"t{t + 1} as materialized (select f.node, "
            f"{tele} * cast(f.is_seed as double) / ns.k + {d} * "
            f"(coalesce(c{t}.c, cast(0 as double)) + "
            f"dm{t}.dm * cast(f.is_seed as double) / ns.k) as trust "
            f"from sflag f left join c{t} on f.node = c{t}.node, ns, dm{t})"
        )
    return (
        "with " + ",\n ".join(parts)
        + f"\n select node, round(trust, 6) as trust from t{iters}"
    )


def opic(
    edges: DataFrame,
    rounds: int = 10,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """OPIC — Adaptive On-Line Page Importance Computation (Abiteboul,
    Preda & Cobena, WWW 2003) over the distinct directed edge set: the
    importance estimator production crawlers actually run ONLINE, vs
    the offline multi-pass PageRank. Each node carries *cash* (current
    flow) and *history* (accumulated flow); a visited node banks its
    cash into history and distributes it equally to its out-links.
    Importance is the Cesàro average (history + cash) / (rounds + 1) —
    this average converges even where plain d=1 power iteration
    oscillates (periodic graphs), which is exactly why OPIC needs no
    damping factor.

    Batch semantics here are the synchronous variant — every node is
    "visited" each round (the paper's greatest-cash-first policy is a
    sequencing optimization, not a semantics change; both converge to
    the same importance vector):

    cash_0 = 1/N, hist_0 = 0;
    hist_{t+1}(v) = hist_t(v) + cash_t(v);
    cash_{t+1}(v) = Σ_{u→v} cash_t(u)/outdeg(u) + dangling_t/N
    (dangling cash rerouted through the paper's virtual node and
    redistributed uniformly, so Σ cash = 1 at every round).

    Scale shape mirrors :func:`pagerank`: one shuffle per round keyed
    on the node id (edges ⋈ cash with map-side partial sums), the
    dangling mass a broadcast 1-row cross join (never a driver scalar),
    lineage cut per round (the cash/hist frame is referenced twice per
    round — contributions + dangling).

    Returns (node, importance) rounded to 6 places; importances sum
    to 1.
    """
    # loop-invariant e/base materialized once (see pagerank comment)
    e = edges.select(src, dst).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_row = nodes.agg(F.count("*").alias("_n"))
    deg = e.groupBy(F.col(src).alias("node")).agg(F.count("*").alias("_deg"))
    base = (
        nodes.join(deg, "node", "left")
        .crossJoin(F.broadcast(n_row))
        .localCheckpoint(eager=True)
    )

    state = nodes.crossJoin(F.broadcast(n_row)).select(
        "node",
        (F.lit(1.0) / F.col("_n")).alias("cash"),
        F.lit(0.0).alias("hist"),
    )
    for t in range(rounds):
        s = base.join(state, "node")
        contrib = (
            s.filter(F.col("_deg").isNotNull())
            .join(e, F.col("node") == F.col(src))
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum(F.col("cash") / F.col("_deg")).alias("_c"))
        )
        dangling = s.agg(
            F.coalesce(
                F.sum(F.when(F.col("_deg").isNull(), F.col("cash"))), F.lit(0.0)
            ).alias("_dm")
        )
        state = (
            s.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.coalesce(F.col("_c"), F.lit(0.0))
                    + F.col("_dm") / F.col("_n")
                ).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
        )
        if (t + 1) % checkpoint_every == 0 and t + 1 < rounds:
            state = state.localCheckpoint(eager=True)
    return state.select(
        "node",
        F.round(
            (F.col("hist") + F.col("cash")) / F.lit(float(rounds + 1)), 6
        ).alias("importance"),
    )


def opic_oracle_sql(edges_cte: str, rounds: int = 10) -> str:
    """Chained-CTE SQL twin of :func:`opic` (same shape as
    :func:`pagerank_oracle_sql`; every state CTE is MATERIALIZED
    because each round references it twice — contributions +
    dangling)."""
    parts = [
        edges_cte,
        "e as (select distinct src, dst from edges)",
        "nodes as (select src as node from e union select dst from e)",
        "nn as (select count(*) as n from nodes)",
        "deg as (select src as node, count(*) as deg from e group by 1)",
        "s0 as materialized (select node, cast(1.0 as double) / nn.n as "
        "cash, cast(0.0 as double) as hist from nodes, nn)",
    ]
    for t in range(rounds):
        parts.append(
            f"c{t} as (select e.dst as node, sum(s.cash / deg.deg) as c "
            f"from s{t} s join deg using (node) join e on e.src = s.node "
            f"group by 1)"
        )
        parts.append(
            f"dm{t} as (select coalesce(sum(s.cash), cast(0 as double)) as dm "
            f"from s{t} s left join deg using (node) where deg.deg is null)"
        )
        parts.append(
            f"s{t + 1} as materialized (select n.node, "
            f"coalesce(c{t}.c, cast(0 as double)) + dm{t}.dm / nn.n as cash, "
            f"s.hist + s.cash as hist "
            f"from nodes n join s{t} s on n.node = s.node "
            f"left join c{t} on n.node = c{t}.node, nn, dm{t})"
        )
    return (
        "with " + ",\n ".join(parts)
        + f"\n select node, round((hist + cash) / cast({rounds + 1} as "
        f"double), 6) as importance from s{rounds}"
    )


# ---------------------------------------------------------------------------
# connected components: large-star / small-star


def connected_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    rounds (Kiveris et al. 2014, "Connected Components in MapReduce
    and Beyond"). Output contract is identical to
    ``textdedup.dedup_clusters`` — (id, cluster_id, keep) with
    cluster_id = the component's minimum id — and the two are pinned
    equal by test on random graphs.

    Why a second clustering path: hash-min label propagation
    (``dedup_clusters``) converges in O(diameter) rounds — right for
    the short chains of a near-dup graph, wrong for long-chain graphs
    (URL redirect chains, site mirrors, citation paths) where the
    diameter can be O(n). Star contraction converges in O(log n)
    rounds on ANY graph shape: each round is two hash exchanges on the
    node id (one per star step) + a distinct, with per-round eager
    ``localCheckpoint`` lineage cuts (same rationale as ``pagerank``).

    Round algebra (all id comparisons are plain column ``<``, so the
    component minimum is the same lexicographic/numeric minimum the
    hash-min path and the DuckDB recursive-CTE oracle compute):

    * large-star at node u over bidirectional neighbors N(u):
      m = min(N(u) ∪ {u}); emit (v, m) for every v in N(u), v > u.
    * small-star over larger-to-smaller directed edges at node u:
      m = min(N(u)); emit (u, m) and (v, m) for v in N(u) \\ {m}.

    Star graphs (every node attached directly to its component min)
    are a fixed point of both steps; convergence is detected by a
    (count, hash-sum) signature of the canonical edge set becoming
    stable — confirmed exactly with one ``exceptAll`` probe before
    exiting, so a signature collision cannot end the loop early.
    Terminates with one row per ``ids`` row; singletons keep
    themselves.
    """
    canon = (
        pairs.select(F.col("ia").alias("_x"), F.col("ib").alias("_y"))
        .filter(F.col("_x") != F.col("_y"))
        .select(
            F.greatest("_x", "_y").alias("_a"),
            F.least("_x", "_y").alias("_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(e: DataFrame):
        # bit_xor is order-independent and cannot overflow (ANSI mode
        # rejects a plain sum of 64-bit hashes); dup edges can't cancel
        # because the set is distinct.
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(_a, _b))"), F.lit(0)
            ).alias("h"),
        ).first()
        return (row["n"], row["h"])

    sig = _sig(canon)
    for _ in range(max_iter):
        # --- large star: group over BOTH directions -------------------
        nbrs = canon.select(
            F.col("_a").alias("_u"), F.col("_b").alias("_v")
        ).unionByName(
            canon.select(F.col("_b").alias("_u"), F.col("_a").alias("_v"))
        )
        mins = nbrs.groupBy("_u").agg(F.min("_v").alias("_mn"))
        ls = (
            nbrs.join(mins, "_u")
            .filter(F.col("_v") > F.col("_u"))
            .select(
                F.col("_v").alias("_a"),
                F.least("_u", "_mn").alias("_b"),
            )
            .distinct()
        )
        # --- small star: edges already directed larger -> smaller -----
        smins = ls.groupBy("_a").agg(F.min("_b").alias("_mn"))
        nxt = (
            ls.join(smins, "_a")
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("_a").alias("a"), F.col("_mn").alias("b")
                        ),
                        F.struct(
                            F.col("_b").alias("a"), F.col("_mn").alias("b")
                        ),
                    )
                ).alias("_e")
            )
            .select(F.col("_e.a").alias("_a"), F.col("_e.b").alias("_b"))
            .filter(F.col("_a") != F.col("_b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        nsig = _sig(nxt)
        if nsig == sig and canon.exceptAll(nxt).limit(1).count() == 0:
            canon = nxt
            break
        canon, sig = nxt, nsig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"star rounds (O(log n) expected — raise max_iter)"
        )

    # converged: canon is a star set (child=_a, center=_b). The
    # groupBy-min is a safety net (a converged star has exactly one
    # center per child) keeping the label join 1:1 by construction.
    centers = canon.groupBy(F.col("_a").alias("_v")).agg(
        F.min("_b").alias("_lbl")
    )
    out = ids.select(F.col(id_col).alias("_v")).join(centers, "_v", "left")
    lbl = F.coalesce(F.col("_lbl"), F.col("_v"))
    return out.select(
        F.col("_v").alias(id_col),
        lbl.alias("cluster_id"),
        (F.col("_v") == lbl).alias("keep"),
    )


def neighbor_jaccard_pairs(
    edges: DataFrame,
    mode: str = "cocitation",
    tau: float = 0.0,
    min_shared: int = 2,
    max_degree: int = 10000,
) -> DataFrame:
    """Host-similarity pairs by shared neighborhoods — the
    "related sites" signal (Dean & Henzinger 1999) crawlers use for
    scope expansion and seed propagation, and TrustRank deployments
    use to grow the trusted set from known-good seeds.

    mode="cocitation": two hosts are similar when the SAME sources
    link to both (pairs of dst sharing src — cited together).
    mode="coupling": bibliographic coupling — two hosts are similar
    when they link to the same targets (pairs of src sharing dst).

    J(a,b) = |N(a) ∩ N(b)| / |N(a) ∪ N(b)| over the DISTINCT shared-
    neighbor sets; output (ia, ib, shared, jaccard) with ia < ib,
    shared >= min_shared, jaccard >= tau.

    Scale shape = the shingle join: one exchange keyed on the SHARED
    vertex (never a host×host cross join), one on the pair. The skew
    point is a super-connector shared vertex (a hub linking 10^6
    hosts would mint 10^12 pairs) — vertices with fan-out above
    ``max_degree`` are EXCLUDED, which is part of the operator's
    semantics (the oracle applies the same cap), the standard move in
    co-citation mining: a page linking to everything carries no
    similarity information, exactly like a stopword shingle.

    No reference counterpart (TSpider has no cross-host analysis);
    extends the graph family alongside pagerank/hits/opic/trustrank.
    """
    if mode == "cocitation":
        via, item = "src", "dst"
    elif mode == "coupling":
        via, item = "dst", "src"
    else:
        raise ValueError(f"mode={mode!r}: 'cocitation' or 'coupling'")
    e = edges.select(via, item).distinct()
    keep_via = (
        e.groupBy(via)
        .agg(F.count("*").alias("_deg"))
        .filter(F.col("_deg") <= max_degree)
        .select(via)
    )
    e = e.join(keep_via, via, "left_semi")
    a = e.select(F.col(via), F.col(item).alias("ia"))
    b = e.select(F.col(via), F.col(item).alias("ib"))
    inter = (
        a.join(b, via)
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").cast("long").alias("shared"))
    )
    sizes = e.groupBy(item).agg(F.count("*").alias("_sz"))
    return (
        inter.join(sizes.withColumnRenamed(item, "ia").withColumnRenamed("_sz", "_sa"), "ia")
        .join(sizes.withColumnRenamed(item, "ib").withColumnRenamed("_sz", "_sb"), "ib")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("_sa") + F.col("_sb") - F.col("shared")),
                6,
            ),
        )
        .filter((F.col("shared") >= min_shared) & (F.col("jaccard") >= tau))
        .select("ia", "ib", "shared", "jaccard")
    )


def resolve_redirects(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Redirect-chain resolution by pointer doubling: given a
    functional redirect graph (at most one out-edge per node — the
    HTTP 3xx shape; duplicate srcs are collapsed keep-min-dst for
    determinism), resolve every node to the node reached after
    ``min(dist_to_terminal, 2**rounds - 1)`` hops. A crawl frontier
    canonicalizes candidate URLs through this map so mirrored redirect
    aliases collapse BEFORE the seen-set probe (the reference follows
    redirects one hop at a time inside the browser; at 10^10 URLs the
    chain walk must be a batch job, not per-fetch).

    Pointer doubling: jump tables J1=edges, J2=J1∘J1, J4=J2∘J2, ...
    (``rounds-1`` self-joins, each ONE shuffle on the join key), then
    every node takes the jumps in DECREASING power order (greedy
    binary: if J_{2^k} exists at the cursor, following it is always
    optimal; if absent the chain ends within 2^k hops and lower
    powers finish it) — so chains of length L resolve in O(log L)
    joins instead of L sequential waves, and CYCLES are safely
    truncated at the hop cap instead of looping forever.

    Returns (node, final, hops, resolved) for every distinct node in
    the graph: ``resolved=1`` iff ``final`` has no out-edge (a true
    terminal — ``resolved=0`` rows sit on a cycle or a chain longer
    than the cap).
    """
    e1 = (
        edges.groupBy(F.col(src).alias("s"))
        .agg(F.min(F.col(dst)).alias("r"))
    )
    jumps = [e1]
    for _ in range(rounds - 1):
        prev = jumps[-1]
        a = prev.select(F.col("s"), F.col("r").alias("_m"))
        b = prev.select(F.col("s").alias("_m"), F.col("r").alias("_r2"))
        jumps.append(a.join(b, "_m").select("s", F.col("_r2").alias("r")))
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    state = nodes.select(
        "node", F.col("node").alias("cur"), F.lit(0).cast("long").alias("hops")
    )
    for i in range(rounds - 1, -1, -1):
        step = 1 << i
        j = jumps[i].select(F.col("s").alias("cur"), F.col("r").alias("_nxt"))
        state = (
            state.join(j, "cur", "left")
            .select(
                "node",
                F.coalesce("_nxt", "cur").alias("cur"),
                (
                    F.col("hops")
                    + F.when(F.col("_nxt").isNotNull(), step).otherwise(0)
                ).cast("long").alias("hops"),
            )
        )
    has_out = e1.select(F.col("s").alias("cur"), F.lit(1).alias("_o"))
    return (
        state.join(has_out, "cur", "left")
        .select(
            "node",
            F.col("cur").alias("final"),
            "hops",
            F.when(F.col("_o").isNull(), 1).otherwise(0).alias("resolved"),
        )
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    UNDIRECTED host graph — community detection for crawl scheduling:
    hosts in one community are typically one site family / mirror
    network / link farm, so budgets and politeness can be set per
    community instead of per host (the coarse-grained analog of the
    reference's per-host budget, ``producer.py`` same-origin scoping).

    Deterministic variant (plain LPA is order-dependent): labels start
    as the node id; every round, EVERY node simultaneously adopts the
    most frequent label among its neighbors, ties broken by the
    smallest label. Synchronous update + total tie-break makes the
    result a pure function of the edge set — required for the DuckDB
    oracle twin (:func:`lpa_oracle_sql`).

    Scale shape: one round = one shuffle keyed on the node id (the
    neighbor⋈labels join and the (node,label) count are co-keyed, and
    the count partial-aggregates map-side), plus an argmax that plans
    as a single-key min(struct) — no windows. Neighbor lists are never
    materialized per node; hot hosts skew the (node) key and are
    handled by AQE like the PageRank contribution join. Lineage is cut
    per round exactly like :func:`pagerank` (the loop is a join chain;
    uncut plans grow with rounds).

    Returns (node, community) — community is the surviving label.
    """
    if iters < 1:
        raise ValueError("label_propagation needs iters >= 1")
    e = edges.select(src, dst).filter(F.col(src) != F.col(dst)).distinct()
    # nbrs is joined every round — materialize once (loop-invariant,
    # same argument as the pagerank e/base checkpoint)
    nbrs = (
        e.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionByName(e.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nbrs.select("node").distinct().select(
        "node", F.col("node").alias("label")
    )
    for i in range(iters):
        counted = (
            nbrs.join(labels.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        # argmax(count) with min-label tie-break == min over
        # struct(-count, label): lexicographic struct ordering gives
        # the largest count first, then the smallest label
        labels = (
            counted.groupBy("node")
            .agg(F.min(F.struct((-F.col("_c")).alias("_nc"), "label")).alias("_w"))
            .select("node", F.col("_w.label").alias("label"))
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("community"))


def lpa_oracle_sql(edges_cte: str, iters: int = 5) -> str:
    """Chained-CTE SQL twin of :func:`label_propagation` (same shape
    as :func:`pagerank_oracle_sql`; ``edges_cte`` must define
    ``edges(src, dst)``)."""
    parts = [
        edges_cte,
        "e as (select distinct src, dst from edges where src <> dst)",
        "nb as (select src as node, dst as nbr from e "
        "union select dst, src from e)",
        "l0 as materialized (select distinct node, node as label from nb)",
    ]
    for t in range(iters):
        parts.append(
            f"c{t} as (select nb.node, l.label, count(*) as c "
            f"from nb join l{t} l on nb.nbr = l.node group by 1, 2)"
        )
        parts.append(
            f"l{t + 1} as materialized (select node, label from ("
            f"select node, label, row_number() over "
            f"(partition by node order by c desc, label) as rn from c{t}"
            f") where rn = 1)"
        )
    return (
        "with " + ",\n ".join(parts)
        + f"\n select node, label as community from l{iters}"
    )


def link_reciprocity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-host link reciprocity over the distinct directed host
    graph — the classic link-farm / mirror-ring signal (spam hosts
    exchange links pairwise far more than organic hosts do; cf.
    Becchetti et al. 2008 link-based web-spam features). Feeds the
    same frontier demotion path as :func:`detect_pattern_traps`.

    Scale shape: ONE self-join shuffle — the distinct edge set joined
    to its own reversal on the (src, dst) composite key (both sides
    hash-partition on the same key, no broadcast needed at any scale),
    then a map-side-combinable groupBy(host). No windows, no Python.

    Returns (host, out_links, reciprocal_links, reciprocity) where
    reciprocity = reciprocal / out, rounded to 6 places.
    """
    e = edges.select(src, dst).filter(F.col(src) != F.col(dst)).distinct()
    rev = e.select(F.col(dst).alias(src), F.col(src).alias(dst)).withColumn(
        "_r", F.lit(1)
    )
    marked = e.join(rev, [src, dst], "left")
    return (
        marked.groupBy(F.col(src).alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("out_links"),
            F.coalesce(F.sum("_r"), F.lit(0)).cast("long").alias(
                "reciprocal_links"
            ),
        )
        .select(
            "host",
            "out_links",
            "reciprocal_links",
            F.round(F.col("reciprocal_links") / F.col("out_links"), 6).alias(
                "reciprocity"
            ),
        )
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over the undirected host graph —
    host-level clustering signal (tightly triangulated host clusters
    are link farms / site families; organic inter-site links close
    far fewer triangles — Becchetti et al. 2008 use exactly this as a
    spam feature). Complements :func:`link_reciprocity` (2-cycles)
    with the 3-cycle density.

    Algorithm: degree orientation (Ortmann & Brandes 2014 / the
    classic compact-forward scheme). Each undirected edge {u, v} is
    directed from the endpoint with the smaller (degree, id) to the
    larger. The resulting DAG has out-degree O(sqrt(m)) regardless of
    how skewed the raw degree distribution is — THE property that
    makes the wedge self-join survive hub hosts at web scale (a 10^7-
    degree hub as wedge pivot would otherwise be a 10^14-row key).
    Every triangle then appears exactly once: its (degree, id)-minimal
    vertex is the only one with two out-edges inside the triangle.

    Plan shape: degree agg (one shuffle, map-side combinable) →
    orientation (edge ⋈ degree twice, co-keyed) → wedge self-join on
    the pivot (out-degree-bounded) → closing-edge semi-ish join on the
    (dst_a, dst_b) composite key → explode the 3 corners → count
    (map-side combinable). No windows, no Python, no broadcast
    required at any scale.

    Returns (node, triangles) for every node of the graph (0 rows for
    isolated ids absent from the edge set; nodes in no triangle get
    triangles = 0 so closed-form clustering coefficients can divide by
    degree without a join back).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower = F.struct("du", "u") < F.struct("dv", "v")
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    w1 = o.select(F.col("s"), F.col("t").alias("t1"))
    w2 = o.select(F.col("s"), F.col("t").alias("t2"))
    wedges = w1.join(w2, "s").filter(F.col("t1") != F.col("t2"))
    closing = o.select(F.col("s").alias("t1"), F.col("t").alias("t2"))
    tri = wedges.join(closing, ["t1", "t2"])
    corners = (
        tri.select(F.col("s").alias("node"))
        .unionByName(tri.select(F.col("t1").alias("node")))
        .unionByName(tri.select(F.col("t2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    return (
        deg.select("node")
        .join(corners, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias(
                "triangles"
            ),
        )
    )


def triangles_oracle_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`triangle_counts` — the same degree
    orientation (row-value tuple comparison), wedge join, and closing
    probe; ``edges_cte`` must define ``edges(src, dst)``."""
    return f"""
 with {edges_cte},
 e as (
   select distinct least(src, dst) as u, greatest(src, dst) as v
   from edges where src <> dst
 ),
 deg as (
   select node, count(*) as d
   from (select u as node from e union all select v from e)
   group by 1
 ),
 o as (
   select case when (du.d, e.u) < (dv.d, e.v) then e.u else e.v end as s,
          case when (du.d, e.u) < (dv.d, e.v) then e.v else e.u end as t
   from e join deg du on e.u = du.node join deg dv on e.v = dv.node
 ),
 tri as (
   select w1.s, w1.t as t1, w2.t as t2
   from o w1
   join o w2 on w1.s = w2.s and w1.t <> w2.t
   join o c on c.s = w1.t and c.t = w2.t
 ),
 corners as (
   select node, count(*)::BIGINT as triangles from (
     select s as node from tri
     union all select t1 from tri
     union all select t2 from tri
   ) group by 1
 )
 select deg.node, coalesce(corners.triangles, 0)::BIGINT as triangles
 from deg left join corners on deg.node = corners.node
"""


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """k-core of the undirected host graph by iterative peeling
    (Seidman 1983; the Batagelj-Zaversnik sequential algorithm's
    synchronous-round form): repeatedly delete every node of degree
    < k until none remains. Dense cores surviving high k are the
    link-farm / mirror-cluster signal complementary to
    :func:`triangle_counts` (cores measure sustained density, not just
    3-cycles), and the classic web-spam feature set uses both.

    ``rounds`` caps the peeling rounds; the operator returns the
    FIXPOINT-OR-ROUND-CAPPED residual graph's nodes, and the semantics
    are "``rounds`` synchronous peels" — deterministic and
    oracle-replayable whether or not the fixpoint was reached (each
    synchronous round strictly shrinks the node set, so ``rounds`` ≥
    the peeling depth gives the exact k-core; depth is ≤ the graph's
    degeneracy ordering length, in practice single digits for web host
    graphs).

    Scale shape per round: one map-side-combinable degree agg over the
    live edge set + two co-keyed semi-joins filtering the edges to
    live endpoints — all keyed on the node id, no windows, no Python.
    Lineage is cut per round (the live-edge plan is self-referencing,
    so uncut plans grow geometrically like PageRank's).

    Returns (node, core_degree) for surviving nodes — core_degree is
    the node's degree WITHIN the residual core (≥ k at fixpoint).
    """
    if k < 1 or rounds < 1:
        raise ValueError("kcore needs k >= 1 and rounds >= 1")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # materialize before the loop: round 1 references e three
        # times (degree agg + two semi-joins) before the per-round
        # checkpoint first fires, re-running the edge derivation
        .localCheckpoint(eager=True)
    )
    for i in range(rounds):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionByName(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        live = deg.filter(F.col("d") >= k).select("node")
        e = e.join(
            live.withColumnRenamed("node", "u"), "u", "left_semi"
        ).join(live.withColumnRenamed("node", "v"), "v", "left_semi")
        if (i + 1) % checkpoint_every == 0 and i + 1 < rounds:
            e = e.localCheckpoint(eager=True)
    return (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


def kcore_oracle_sql(edges_cte: str, k: int = 3, rounds: int = 8) -> str:
    """Chained-CTE DuckDB twin of :func:`kcore` — the same synchronous
    peels; ``edges_cte`` must define ``edges(src, dst)``."""
    parts = [
        edges_cte,
        "e0 as (select distinct least(src, dst) as u, greatest(src, dst) as v"
        " from edges where src <> dst)",
    ]
    for t in range(rounds):
        parts.append(
            f"d{t} as (select node, count(*) as d from ("
            f"select u as node from e{t} union all select v from e{t}"
            f") group by 1)"
        )
        parts.append(
            f"l{t} as (select node from d{t} where d >= {k})"
        )
        parts.append(
            f"e{t + 1} as materialized (select e.u, e.v from e{t} e "
            f"join l{t} a on e.u = a.node join l{t} b on e.v = b.node)"
        )
    return (
        "with " + ",\n ".join(parts)
        + f"\n select node, count(*)::BIGINT as core_degree from ("
        f"select u as node from e{rounds} union all select v from e{rounds}"
        f") group by 1"
    )


# --- HyperBall ---------------------------------------------------------------

_HB_HASH_BITS = 60


def _hb_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hb_est(m: int, s_col, nz_col):
    """The HLL estimate (with linear-counting small-range correction)
    over a partial register table — same math as sketch.hll_cardinality,
    inlined so graph.py carries no cross-module expression coupling."""
    s_full = s_col + (F.lit(m) - nz_col)
    v = (F.lit(m) - nz_col).cast("double")
    raw = F.lit(_hb_alpha(m) * m * m) / s_full
    return F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)


def _hyperball_allest(
    edges: DataFrame,
    radius: int,
    b: int,
    src: str,
    dst: str,
    checkpoint_every: int,
) -> DataFrame:
    """Shared HyperBall round loop: returns the per-round estimate
    table (node, t, est) for t in 0..radius (see :func:`hyperball`
    for the algorithm and scale notes)."""
    if radius < 1:
        raise ValueError("hyperball needs radius >= 1")
    m = 1 << b
    w_bits = _HB_HASH_BITS - b
    # e is joined every round — materialize once (loop-invariant)
    e = edges.select(src, dst).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    hv = F.conv(F.substring(F.md5(F.col("node")), 1, 15), 16, 10).cast("long")
    w = F.shiftrightunsigned(hv, b)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) - F.length(F.bin(w)) + 1
    )
    sk = nodes.select(
        "node",
        F.pmod(hv, F.lit(m)).cast("int").alias("reg"),
        rho.cast("int").alias("rho"),
    )

    def _est(regs: DataFrame, t: int) -> DataFrame:
        agg = regs.groupBy("node").agg(
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
            F.count(F.lit(1)).alias("_nz"),
        )
        return agg.select(
            "node",
            F.lit(t).alias("t"),
            _hb_est(m, F.col("_s"), F.col("_nz")).alias("est"),
        )

    ests = [_est(sk, 0)]
    for t in range(1, radius + 1):
        succ = (
            e.join(sk, F.col(dst) == F.col("node"))
            .select(F.col(src).alias("node"), "reg", "rho")
        )
        sk = (
            sk.unionByName(succ)
            .groupBy("node", "reg")
            .agg(F.max("rho").alias("rho"))
        )
        if t % checkpoint_every == 0 and t < radius:
            sk = sk.localCheckpoint(eager=True)
        ests.append(_est(sk, t))
    allest = ests[0]
    for d in ests[1:]:
        allest = allest.unionByName(d)
    return allest


def hyperball(
    edges: DataFrame,
    radius: int = 4,
    b: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): the neighborhood function and
    harmonic centrality of every node, estimated with per-node
    HyperLogLog sketches — THE algorithm for distance-based
    centralities on web-scale graphs, where exact BFS-per-node is
    O(n·m) and materializing B(v, t) exactly is memory-impossible at
    10^10 edges.

    State per node is m = 2^b registers REGARDLESS of ball size, and
    each round is ONE co-keyed shuffle: ball_t(v) = ball_{t-1}(v) ∪
    (⋃ over v→w of ball_{t-1}(w)) becomes a register-table union +
    ``groupBy(node, reg).max(rho)`` — HLL union is register-wise max,
    which partial-aggregates map-side exactly like a sum. Lineage is
    cut per round (the PageRank loop's measured 308 s → 10 s lesson).

    Registers use the repo's portable md5/60-bit idiom (same as
    ``operators/sketch.py``), so every register — and therefore every
    estimate — is replayed BIT-FOR-BIT by :func:`hyperball_oracle_sql`.

    Returns (node, ball, harmonic): ``ball`` = |B(v, radius)| estimate
    (4dp), ``harmonic`` = Σ_t (|B_t| − |B_{t−1}|)/t (6dp), assembled
    from the per-round estimates with a FIXED-ORDER arithmetic
    expression (a pivot, not a float groupBy-sum, so summation order
    can't wiggle the last bits between engines).
    """
    allest = _hyperball_allest(edges, radius, b, src, dst, checkpoint_every)
    # pivot to fixed columns, then a fixed-order harmonic expression
    piv = allest.groupBy("node").agg(
        *[
            F.max(F.when(F.col("t") == t, F.col("est"))).alias(f"e{t}")
            for t in range(radius + 1)
        ]
    )
    harm = F.lit(0.0)
    for t in range(1, radius + 1):
        harm = harm + (F.col(f"e{t}") - F.col(f"e{t-1}")) * F.lit(1.0 / t)
    return piv.select(
        "node",
        F.round(F.col(f"e{radius}"), 4).alias("ball"),
        F.round(harm, 6).alias("harmonic"),
    )


def hyperball_oracle_sql(edges_cte: str, radius: int = 4, b: int = 4) -> str:
    """Chained-CTE DuckDB twin of :func:`hyperball`: identical md5
    registers, union-as-max rounds, estimate formula, and fixed-order
    harmonic assembly. ``edges_cte`` must define ``edges(src, dst)``."""
    m = 1 << b
    w_bits = _HB_HASH_BITS - b
    alpha = _hb_alpha(m)
    est_expr = (
        f"case when ({alpha} * {m} * {m}) / (s + ({m} - nz)) <= {2.5 * m}"
        f"          and ({m} - nz) > 0"
        f"     then {float(m)} * ln({float(m)} / ({m} - nz))"
        f"     else ({alpha} * {m} * {m}) / (s + ({m} - nz)) end"
    )
    parts = [
        edges_cte,
        "e as (select distinct src, dst from edges)",
        "nodes as (select src as node from e union select dst from e)",
        f"""sk0 as materialized (
   select node,
          cast(hv % {m} as int) as reg,
          max(case when hv // {m} = 0 then {w_bits + 1}
              else {w_bits} - length(bin(hv // {m})) + 1 end) as rho
   from (select node,
                ('0x' || substring(md5(node), 1, 15))::BIGINT as hv
         from nodes)
   group by 1, 2)""",
        f"""est0 as (
   select node, 0 as t, {est_expr} as est
   from (select node, sum(power(2.0, -rho)) as s, count(*) as nz
         from sk0 group by 1))""",
    ]
    for t in range(1, radius + 1):
        parts.append(
            f"""sk{t} as materialized (
   select node, reg, max(rho) as rho from (
     select node, reg, rho from sk{t - 1}
     union all
     select e.src as node, s.reg, s.rho
     from e join sk{t - 1} s on s.node = e.dst
   ) group by 1, 2)"""
        )
        parts.append(
            f"""est{t} as (
   select node, {t} as t, {est_expr} as est
   from (select node, sum(power(2.0, -rho)) as s, count(*) as nz
         from sk{t} group by 1))"""
        )
    union = " union all ".join(
        f"select * from est{t}" for t in range(radius + 1)
    )
    pivots = ", ".join(
        f"max(case when t = {t} then est end) as e{t}"
        for t in range(radius + 1)
    )
    harm = " + ".join(
        f"(e{t} - e{t - 1}) * {1.0 / t!r}" for t in range(1, radius + 1)
    )
    return (
        "with " + ",\n ".join(parts)
        + f""",
 allest as ({union}),
 piv as (select node, {pivots} from allest group by 1)
 select node, round(e{radius}, 4) as ball,
        round({harm}, 6) as harmonic
 from piv"""
    )


def hyperball_eval(
    edges: DataFrame,
    radius: int = 4,
    b: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact-vs-sketch harness for :func:`hyperball` — the
    "measure, don't guess" companion the LSH (``lsh_eval``) and bloom
    (``bloom_fpr``) prefilters already have: compute the EXACT
    bounded-radius harmonic centrality by materializing the distinct
    reachable-pair set per hop (pairs_t = pairs_{t-1} ∪ pairs_{t-1}⋈e
    — O(n·m) and memory-heavy, which is exactly WHY HyperBall exists;
    run it on a subgraph you can afford, never the full crawl graph)
    and report it beside the HLL estimate per node.

    Per hop: one hash join + distinct with a lineage cut. The
    harmonic sums use the same fixed-order expression as
    :func:`hyperball` so cross-engine float equality holds.

    Returns (node, harmonic_exact[6dp], harmonic_est[6dp],
    abs_err[6dp]).
    """
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    pairs = nodes.select("node", F.col("node").alias("_w"))
    bts = []  # per-t ball-size tables (node, b{t})
    for t in range(1, radius + 1):
        ext = pairs.join(e, pairs["_w"] == e["_s"]).select(
            "node", F.col("_d").alias("_w")
        )
        pairs = (
            pairs.unionByName(ext).distinct().localCheckpoint(eager=True)
        )
        bts.append(
            pairs.groupBy("node").agg(
                F.count(F.lit(1)).cast("double").alias(f"_b{t}")
            )
        )
    exact = nodes
    for bt in bts:
        exact = exact.join(bt, "node")
    harm = F.lit(0.0)
    prev = F.lit(1.0)  # |B(v,0)| = 1 exactly
    for t in range(1, radius + 1):
        harm = harm + (F.col(f"_b{t}") - prev) * F.lit(1.0 / t)
        prev = F.col(f"_b{t}")
    exact = exact.select(
        "node", F.round(harm, 6).alias("harmonic_exact")
    )
    est = hyperball(edges, radius, b, src, dst).select(
        "node", F.col("harmonic").alias("harmonic_est")
    )
    return exact.join(est, "node").select(
        "node",
        "harmonic_exact",
        "harmonic_est",
        F.round(
            F.abs(F.col("harmonic_est") - F.col("harmonic_exact")), 6
        ).alias("abs_err"),
    )


def hyperball_eval_oracle_sql(
    edges_cte: str, radius: int = 4, b: int = 4
) -> str:
    """DuckDB twin of :func:`hyperball_eval`: reuses the register/
    estimate CTE chain of :func:`hyperball_oracle_sql` for the sketch
    side and a bounded distinct-closure chain for the exact side."""
    base = hyperball_oracle_sql(edges_cte, radius, b)
    head, _, _ = base.rpartition(",\n allest as (")
    parts = ["p0 as (select node, node as w from nodes)"]
    for t in range(1, radius + 1):
        parts.append(
            f"""p{t} as materialized (
   select distinct node, w from (
     select node, w from p{t - 1}
     union all
     select p.node, e.dst as w from p{t - 1} p join e on e.src = p.w
   ))"""
        )
        parts.append(
            f"b{t} as (select node, cast(count(*) as double) as b{t} "
            f"from p{t} group by 1)"
        )
    joins = " ".join(
        f"join b{t} using (node)" for t in range(1, radius + 1)
    )
    harm_terms = []
    prev = "cast(1.0 as double)"
    for t in range(1, radius + 1):
        harm_terms.append(f"(b{t} - {prev}) * {1.0 / t!r}")
        prev = f"b{t}"
    harm = " + ".join(harm_terms)
    union = " union all ".join(
        f"select * from est{t}" for t in range(radius + 1)
    )
    pivots = ", ".join(
        f"max(case when t = {t} then est end) as e{t}"
        for t in range(radius + 1)
    )
    est_harm = " + ".join(
        f"(e{t} - e{t - 1}) * {1.0 / t!r}" for t in range(1, radius + 1)
    )
    closure = ",\n ".join(parts)
    return (
        head
        + f""",
 allest as ({union}),
 piv as (select node, {pivots} from allest group by 1),
 esth as (select node, round({est_harm}, 6) as harmonic_est from piv),
 {closure},
 exact as (select node, round({harm}, 6) as harmonic_exact
           from nodes {joins})
 select x.node, x.harmonic_exact, s.harmonic_est,
        round(abs(s.harmonic_est - x.harmonic_exact), 6) as abs_err
 from exact x join esth s using (node)"""
    )


def hyperball_distances(
    edges: DataFrame,
    radius: int = 6,
    b: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """Graph-level distance distribution from the same HyperBall
    rounds: the neighborhood function N(t) = Σ_v |B(v, t)|, its
    per-hop increments, and the 90% EFFECTIVE DIAMETER (smallest
    interpolated t with N(t) ≥ 0.9·N(radius)) — the standard
    reachability health numbers for a web graph (is the crawl frontier
    one tight ball, or islands?).

    Everything after the shared round loop operates on radius+1 rows;
    the interpolation is a bounded-heap first-crossing pick, and the
    total is a broadcast 1-row cross join.

    Returns (t, neighborhood[4dp], delta[4dp], reach_frac[6dp],
    eff_diameter[4dp — same value every row]).
    """
    allest = _hyperball_allest(edges, radius, b, src, dst, checkpoint_every)
    nt = allest.groupBy("t").agg(
        F.round(F.sum("est"), 4).alias("neighborhood")
    )
    prev = nt.select(
        (F.col("t") + 1).alias("t"), F.col("neighborhood").alias("_prev")
    )
    tot = (
        nt.orderBy(F.desc("t"))
        .limit(1)
        .select(F.col("neighborhood").alias("_tot"))
    )
    joined = nt.join(prev, "t", "left").crossJoin(F.broadcast(tot))
    hit = (
        joined.filter(
            F.col("neighborhood") >= F.lit(0.9) * F.col("_tot")
        )
        .orderBy("t")
        .limit(1)
        .select(
            F.when(F.col("t") == 0, F.lit(0.0))
            .otherwise(
                (F.col("t") - 1)
                + (F.lit(0.9) * F.col("_tot") - F.col("_prev"))
                / (F.col("neighborhood") - F.col("_prev"))
            )
            .alias("_ed")
        )
    )
    return joined.crossJoin(F.broadcast(hit)).select(
        "t",
        "neighborhood",
        F.round(
            F.col("neighborhood") - F.coalesce(F.col("_prev"), F.lit(0.0)), 4
        ).alias("delta"),
        F.round(F.col("neighborhood") / F.col("_tot"), 6).alias("reach_frac"),
        F.round(F.col("_ed"), 4).alias("eff_diameter"),
    )


def hyperball_distances_oracle_sql(
    edges_cte: str, radius: int = 6, b: int = 4
) -> str:
    """DuckDB twin of :func:`hyperball_distances` — same register
    chain as :func:`hyperball_oracle_sql`, finalized corpus-level."""
    base = hyperball_oracle_sql(edges_cte, radius, b)
    # reuse the register/estimate CTE chain; swap the final select
    head, _, _ = base.rpartition(",\n allest as (")
    union = " union all ".join(
        f"select * from est{t}" for t in range(radius + 1)
    )
    return (
        head
        + f""",
 allest as ({union}),
 nt as (select t, round(sum(est), 4) as neighborhood
        from allest group by 1),
 j as (select a.t, a.neighborhood, b.neighborhood as prev
       from nt a left join nt b on b.t = a.t - 1),
 tot as (select neighborhood as tot from nt order by t desc limit 1),
 hit as (
   select case when t = 0 then cast(0.0 as double)
          else (t - 1) + (cast(0.9 as double) * tot - prev)
                         / (neighborhood - prev) end as ed
   from j cross join tot
   where neighborhood >= cast(0.9 as double) * tot
   order by t limit 1)
 select j.t, j.neighborhood,
        round(j.neighborhood - coalesce(j.prev, cast(0.0 as double)), 4)
          as delta,
        round(j.neighborhood / tot, 6) as reach_frac,
        round(ed, 4) as eff_diameter
 from j cross join tot cross join hit"""
    )
