"""Mergeable cardinality sketches for crawl-state accounting.

A 10^10-URL frontier needs per-host distinct-URL counts continuously
(budget accounting, trap detection, recrawl scheduling), and exact
distinct is a full shuffle of the key space every time. The standard
answer is HyperLogLog (Flajolet et al. 2007): a fixed m-register
sketch per group that (a) partial-aggregates map-side like a sum,
(b) merges across shards/waves with a register-wise max — the shape
Spark's own ``approx_count_distinct`` uses internally.

This module implements HLL EXPLICITLY with the repo's portable
md5-hash idiom instead of calling the built-in, for two reasons:

- **Oracle-checkability**: every register value is deterministic
  integer/string math (md5 → register index + leading-zero rank via
  ``bin()`` string length — both engines print binary without leading
  zeros), so the DuckDB twin reproduces the sketch BIT-FOR-BIT, not
  approximately. Spark's built-in HLL++ and DuckDB's approx sketch
  disagree by construction and would force a weak rows-only check.
- **Merge visibility**: the register table (group, register, max-rho)
  is a first-class DataFrame that can be stored in the crawl state,
  merged across waves with ``groupBy(...).agg(max(...))``, and only
  finalized into an estimate when read — the real production pattern
  (store sketches, not numbers).

Reference parity: TSpider keeps exact per-host counts in Redis
(``spider.py`` REQUEST_COUNT inc); this is the sketch that replaces
that counter at frontier scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 15 md5 hex chars -> 60-bit hash: b bits pick the register, the
# remaining W = 60 - b bits feed the leading-zero rank.
_HASH_BITS = 60


def _alpha(m: int) -> float:
    """Standard HLL bias constant (Flajolet et al. 2007, Fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_col: str = "hostname",
    item_col: str = "url",
    b: int = 6,
) -> DataFrame:
    """(group, reg, rho) register table: reg = low b bits of the 60-bit
    md5 hash, rho = 1 + leading zeros of the remaining W bits (computed
    as W - len(bin(w)) + 1 — pure integer/string math, identical in
    Spark and DuckDB), max-aggregated per (group, reg).

    One map-side-combinable shuffle keyed on (group, reg) — the
    aggregation state per group is AT MOST m = 2^b registers however
    many items the group has; this is the whole point at 10^10 URLs.
    """
    m = 1 << b
    w_bits = _HASH_BITS - b
    hv = F.conv(F.substring(F.md5(F.col(item_col)), 1, 15), 16, 10).cast(
        "long"
    )
    # hv < 2^60 exceeds double's exact-integer range, so hv/m via
    # doubles would corrupt low bits — shift in integer space
    w = F.shiftrightunsigned(hv, b)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) - F.length(F.bin(w)) + 1
    )
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.pmod(hv, F.lit(m)).cast("int").alias("reg"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    regs: DataFrame, b: int, group_col: str = "hostname"
) -> DataFrame:
    """Finalize a ``(group_col, reg, rho)`` register table into
    per-group estimates — the READ side of the store-sketches-not-
    numbers pattern (register tables persisted in the crawl state and
    max-merged across waves/micro-batches finalize through this).
    Output: (group_col, n_hll)."""
    m = 1 << b
    agg = regs.groupBy(group_col).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
        F.count(F.lit(1)).alias("_nz"),
    )
    # registers never hit contribute 2^0 each; V = m - nz empties
    s_full = F.col("_s") + (F.lit(m) - F.col("_nz"))
    v = (F.lit(m) - F.col("_nz")).cast("double")
    raw = F.lit(_alpha(m) * m * m) / s_full
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(group_col, F.round(est, 4).alias("n_hll"))


def hll_cardinality(
    df: DataFrame,
    group_col: str = "hostname",
    item_col: str = "url",
    b: int = 6,
    with_exact: bool = False,
) -> DataFrame:
    """Per-group HLL distinct-count estimate, finalized from
    :func:`hll_registers` with the standard small-range (linear
    counting) correction. ``with_exact=True`` adds the exact distinct
    count alongside (a second shuffle — the comparison column for
    tests/contract, not something you'd run at 10^10).

    Estimate math: E = alpha_m * m^2 / sum(2^-M_j) over all m
    registers (absent registers count as M=0 -> 2^0 = 1); if E <= 2.5m
    and V empty registers exist, E = m * ln(m / V). The float parts
    are rounded to 4 decimals (the sums are 64 powers of two whose
    addition order can differ across engines in the last ulps).

    Output: (group_col, n_hll [, n_exact, rel_err]).
    """
    regs = hll_registers(df, group_col, item_col, b)
    out = hll_estimate(regs, b, "grp").withColumnRenamed("grp", group_col)
    if with_exact:
        exact = (
            df.select(F.col(group_col), F.col(item_col))
            .distinct()
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        )
        out = out.join(exact, group_col).select(
            group_col,
            "n_exact",
            "n_hll",
            F.round(
                (F.col("n_hll") - F.col("n_exact")) / F.col("n_exact"), 4
            ).alias("rel_err"),
        )
    return out


def hll_oracle_sql(
    src_cte: str,
    group_col: str = "hostname",
    item_col: str = "url",
    b: int = 6,
    with_exact: bool = False,
) -> str:
    """DuckDB twin of :func:`hll_cardinality`; ``src_cte`` must define
    ``src(<group_col>, <item_col>)``."""
    m = 1 << b
    w_bits = _HASH_BITS - b
    alpha = _alpha(m)
    est_cols = (
        f"select grp as {group_col}, round(est, 4) as n_hll from est"
        if not with_exact
        else f"""
 select e.grp as {group_col}, x.n_exact, round(e.est, 4) as n_hll,
        round((round(e.est, 4) - x.n_exact) / x.n_exact, 4) as rel_err
 from est e join (
   select {group_col} as grp, count(*)::BIGINT as n_exact
   from (select distinct {group_col}, {item_col} from src) group by 1
 ) x on e.grp = x.grp"""
    )
    return f"""
 with {src_cte},
 h as (
   select {group_col} as grp,
          ('0x' || substring(md5({item_col}), 1, 15))::BIGINT as hv
   from src
 ),
 r0 as (
   select grp, cast(hv % {m} as int) as reg, hv // {m} as w from h
 ),
 r as (
   select grp, reg,
          max(case when w = 0 then {w_bits + 1}
              else {w_bits} - length(bin(w)) + 1 end) as rho
   from r0 group by 1, 2
 ),
 a as (
   select grp, sum(power(2.0, -rho)) as s, count(*) as nz from r group by 1
 ),
 est as (
   select grp,
          case when ({alpha} * {m} * {m}) / (s + ({m} - nz)) <= {2.5 * m}
                    and ({m} - nz) > 0
               then {float(m)} * ln({float(m)} / ({m} - nz))
               else ({alpha} * {m} * {m}) / (s + ({m} - nz)) end as est
   from a
 )
 {est_cols}
"""


def cms_table(
    df: DataFrame,
    item_col: str = "url",
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """(row, bucket, cnt) count-min sketch table (Cormode &
    Muthukrishnan 2005): d independent md5-salted hash rows of w
    counters each. The frequency-tracking companion of the HLL
    cardinality sketch — per-host URL-pattern frequencies, hot-path
    detection, trap scoring — with TOTAL state d*w counters however
    many items stream through.

    Same explicit-portable-hash rationale as :func:`hll_registers`:
    the oracle rebuilds every counter bit-for-bit, and the table
    merges across shards/waves by element-wise SUM (pinned by test) —
    store the sketch, not the counts.

    One map-side-combinable shuffle keyed on (row, bucket); the d-way
    fan-out is a constant-width explode, not d scans.
    """
    rows = F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("_j")
    fanned = df.select(F.col(item_col).alias("_it"), rows)
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.col("_j").cast("string"), F.lit(":"), F.col("_it"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        fanned.select(
            F.col("_j").alias("row"),
            F.pmod(hv, F.lit(w)).cast("int").alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_top_k(
    df: DataFrame,
    item_col: str = "url",
    k: int = 10,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Exact top-k items by frequency alongside their count-min
    estimates — the validation face of :func:`cms_table` (n_cms >=
    n_exact ALWAYS; the gap is the sketch's collision overestimate at
    this d x w). The exact side is a TakeOrderedAndProject top-k (no
    global sort); the estimate side probes the d sketch rows for just
    the k winners (broadcast of k rows) and takes the row-wise min.

    Returns (item, n_exact, n_cms) for the k most frequent items,
    ties broken by item ascending.
    """
    sketch = cms_table(df, item_col, d, w)
    exact = (
        df.groupBy(F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("item").asc())
        .limit(int(k))
    )
    rows = F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("row")
    probes = exact.select("item", "n_exact", rows)
    hv = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col("row").cast("string"), F.lit(":"), F.col("item"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    probes = probes.withColumn("bucket", F.pmod(hv, F.lit(w)).cast("int"))
    return (
        sketch.join(F.broadcast(probes), ["row", "bucket"])
        .groupBy("item", "n_exact")
        .agg(F.min("cnt").cast("long").alias("n_cms"))
    )


def cms_oracle_sql(
    src_cte: str,
    item_col: str = "url",
    k: int = 10,
    d: int = 4,
    w: int = 256,
) -> str:
    """DuckDB twin of :func:`cms_top_k`; ``src_cte`` must define
    ``src(<item_col>)`` (extra columns ignored)."""
    return f"""
 with {src_cte},
 fan as (
   select {item_col} as it, j
   from src cross join (select unnest(range(0, {d})) as j)
 ),
 sk as (
   select j as row,
          cast(('0x' || substring(md5(j || ':' || it), 1, 15))::BIGINT
               % {w} as int) as bucket,
          count(*)::BIGINT as cnt
   from fan group by 1, 2
 ),
 exact as (
   select {item_col} as item, count(*)::BIGINT as n_exact
   from src group by 1
   order by n_exact desc, item asc limit {k}
 ),
 probes as (
   select e.item, e.n_exact, j as row,
          cast(('0x' || substring(md5(j || ':' || e.item), 1, 15))::BIGINT
               % {w} as int) as bucket
   from exact e cross join (select unnest(range(0, {d})) as j)
 )
 select p.item, p.n_exact, min(sk.cnt)::BIGINT as n_cms
 from probes p join sk using (row, bucket)
 group by 1, 2
"""


def hll_overlap(
    df: DataFrame,
    group_col: str = "lang",
    item_col: str = "w",
    b: int = 6,
) -> DataFrame:
    """Pairwise set-overlap estimates between groups via HLL algebra:
    |A ∩ B| ≈ |A| + |B| − |A ∪ B|, where the union sketch is just the
    register-wise max of the two group sketches — no re-scan of the
    items, no pairwise item join. The curation use: how much does one
    source/language's vocabulary (or URL space, or shingle set)
    overlap another's, at 10^10 items, from state the size of
    #groups × 2^b.

    Everything is one :func:`hll_registers` pass + joins against the
    TINY distinct-group-pair table (#groups², broadcast); union
    registers aggregate per (pair, reg) with map-side combine.

    Estimates are the same 4dp-rounded finalization as
    :func:`hll_estimate` on all three sketches; the intersection
    (inclusion-exclusion of rounded values, clamped at 0 — I-E can go
    slightly negative at sketch error) is exact double math after
    that, so the oracle replays it bit-for-bit.

    Returns (grp_a, grp_b, n_a, n_b, n_union, n_inter) for unordered
    pairs grp_a < grp_b.
    """
    regs = hll_registers(df, group_col, item_col, b)
    ests = hll_estimate(regs, b, "grp")
    groups = regs.select("grp").distinct()
    pairs = (
        groups.select(F.col("grp").alias("grp_a"))
        .crossJoin(groups.select(F.col("grp").alias("grp_b")))
        .filter(F.col("grp_a") < F.col("grp_b"))
    )
    side_a = regs.join(
        F.broadcast(pairs), F.col("grp") == F.col("grp_a")
    ).select("grp_a", "grp_b", "reg", "rho")
    side_b = regs.join(
        F.broadcast(pairs), F.col("grp") == F.col("grp_b")
    ).select("grp_a", "grp_b", "reg", "rho")
    union_regs = (
        side_a.unionByName(side_b)
        .groupBy("grp_a", "grp_b", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    m = 1 << b
    uagg = union_regs.groupBy("grp_a", "grp_b").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
        F.count(F.lit(1)).alias("_nz"),
    )
    s_full = F.col("_s") + (F.lit(m) - F.col("_nz"))
    v = (F.lit(m) - F.col("_nz")).cast("double")
    raw = F.lit(_alpha(m) * m * m) / s_full
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    u = uagg.select("grp_a", "grp_b", F.round(est, 4).alias("n_union"))
    ea = ests.select(F.col("grp").alias("grp_a"), F.col("n_hll").alias("n_a"))
    eb = ests.select(F.col("grp").alias("grp_b"), F.col("n_hll").alias("n_b"))
    return (
        u.join(F.broadcast(ea), "grp_a")
        .join(F.broadcast(eb), "grp_b")
        .select(
            "grp_a",
            "grp_b",
            "n_a",
            "n_b",
            "n_union",
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.col("n_a") + F.col("n_b") - F.col("n_union"),
                ),
                4,
            ).alias("n_inter"),
        )
    )


def hll_overlap_oracle_sql(
    src_cte: str,
    group_col: str = "lang",
    item_col: str = "w",
    b: int = 6,
) -> str:
    """DuckDB twin of :func:`hll_overlap`; ``src_cte`` must define
    ``src(<group_col>, <item_col>)``."""
    m = 1 << b
    w_bits = _HASH_BITS - b
    alpha = _alpha(m)

    def est(s, nz):
        return (
            f"case when ({alpha} * {m} * {m}) / ({s} + ({m} - {nz}))"
            f"          <= {2.5 * m} and ({m} - {nz}) > 0"
            f"     then {float(m)} * ln({float(m)} / ({m} - {nz}))"
            f"     else ({alpha} * {m} * {m}) / ({s} + ({m} - {nz})) end"
        )

    return f"""
 with {src_cte},
 h as (
   select {group_col} as grp,
          ('0x' || substring(md5({item_col}), 1, 15))::BIGINT as hv
   from src
 ),
 r as (
   select grp, cast(hv % {m} as int) as reg,
          max(case when hv // {m} = 0 then {w_bits + 1}
              else {w_bits} - length(bin(hv // {m})) + 1 end) as rho
   from h group by 1, 2
 ),
 e as (
   select grp, round({est('s', 'nz')}, 4) as n_hll
   from (select grp, sum(power(2.0, -rho)) as s, count(*) as nz
         from r group by 1)
 ),
 pairs as (
   select a.grp as grp_a, b.grp as grp_b
   from (select distinct grp from r) a, (select distinct grp from r) b
   where a.grp < b.grp
 ),
 ur as (
   select grp_a, grp_b, reg, max(rho) as rho from (
     select p.grp_a, p.grp_b, r.reg, r.rho
     from pairs p join r on r.grp = p.grp_a
     union all
     select p.grp_a, p.grp_b, r.reg, r.rho
     from pairs p join r on r.grp = p.grp_b
   ) group by 1, 2, 3
 ),
 u as (
   select grp_a, grp_b, round({est('s', 'nz')}, 4) as n_union
   from (select grp_a, grp_b, sum(power(2.0, -rho)) as s, count(*) as nz
         from ur group by 1, 2)
 )
 select u.grp_a, u.grp_b, ea.n_hll as n_a, eb.n_hll as n_b, u.n_union,
        round(greatest(cast(0.0 as double),
                       ea.n_hll + eb.n_hll - u.n_union), 4) as n_inter
 from u join e ea on ea.grp = u.grp_a join e eb on eb.grp = u.grp_b
"""
