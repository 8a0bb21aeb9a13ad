"""The wave scheduler: TSpider's sequential, side-effectful admission
pipeline (scanned-dedupe F8, per-host budget F9, new-host index seeding
A2) re-derived as pure JVM window functions — no Python, no loops.

Why this is exact
-----------------
In the reference, candidates are admitted one at a time
(redis_utils.py:149-196); admitting a task marks its scan-key and
increments its host's reqcount, which changes later decisions. That
sequential fold collapses to closed-form window expressions because of
three monotonicity facts:

1. *Scanned keys only grow*, and only admissions add them — so within
   a wave only the FIRST candidate per (host, scan_key) can ever be
   admitted; later duplicates are rejected no matter what
   (row_number over (hostname, scan_key) == 1).
2. *reqcount only grows*, and the budget check is a strict ``>``
   against a cap (redis_utils.py:188) — so per host, rejection by
   budget is suffix-closed: the admitted set is exactly the first
   ``C = max_per_host + 1 - reqcount_prior`` dedupe-survivors
   (a running count over the host window).
3. *Index-page seeding (A2, producer.py:101-103) only fires while
   reqcount == 0.* The first fold row of a fresh host is always
   admitted (its key survived the global anti-join, the wave has seen
   nothing yet, and budget 0 <= cap) — after which reqcount > 0, so
   every later synthetic row is a guaranteed no-op. Hence: keep a
   synthetic row iff it is row 1 of a host whose prior count is 0;
   drop all others *before* ranking.

Rejected rows have no side effects in the reference, so pre-filtering
(stateless predicates, prior-scanned anti-join, doomed synthetics)
never changes later decisions.

Scale notes (10^10-frontier): the dedupe window and the budget window
both shuffle by hostname — the designated skew point. ``reduce_first``
pre-aggregates candidates to min-order per (host, key) with a
map-side-combinable groupBy *before* the host window, so a hot host
contributes at most its distinct-key count to the window sort, and AQE
skew handling covers the rest. Admitted rows per host per wave are
bounded by cap+1, so everything downstream of the fold is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# global candidate order: parent task rank, per-page emission rank,
# synthetic-index-rows-first tiebreak (A2 fires before create_task(url))
ORDER_COLS = ("task_rank", "seq", "synth_rank")


def admit_wave(
    cands: DataFrame,
    host_budget: DataFrame,
    max_per_host: int,
    reduce_first: bool = True,
    partitions: int | None = None,
    code_col: str | None = None,
) -> DataFrame:
    """Admission fold over one wave of candidates.

    ``cands`` columns: ``hostname, scan_key, url, task_rank, seq,
    synth_rank`` (+ passthrough). Must already be stateless-filtered
    and anti-joined against the committed seen_scanned set.
    ``host_budget``: (hostname, reqcount) committed state.

    Returns admitted rows with an ``admit_rank``: their within-wave
    admission order (dense over ORDER_COLS), plus ``hostname``.

    Physical modes:

    * ``partitions=N`` — ONE explicit hash exchange on ``hostname``;
      every window below then runs exchange-free (their partition keys
      contain hostname), and the duplicate-key window subsumes the
      pre-reduction. This is the scale path: the whole fold costs one
      shuffle of the candidate stream. ``reduce_first`` is ignored.
    * ``partitions=None`` and the input is ALREADY hash-partitioned by
      hostname (e.g. straight out of a co-partitioned seen anti-join):
      zero additional exchanges.
    * ``reduce_first=True`` (legacy/small): pre-aggregate to min-order
      per (host, key) before the host window. Note the struct-min plans
      as a SortAggregate (struct agg buffers are not hash-aggregable),
      so at width this is slower than the window path — kept for exact
      parity testing of the fold's algebra.

    ``code_col``: name of a precomputed xxhash64(hostname) column
    (e.g. from anti_join_seen_copart's code regime). Every window is
    then keyed (code, hostname) — semantically identical partitioning
    (code is a pure function of the host, and the host stays a key so
    collisions can't merge hosts) but the window sorts compare the
    8-byte long first and the string only on ties. Exact
    (tests/test_schedule_modes.py). The code column is dropped from
    the output.
    """
    hostkeys = ([code_col] if code_col else []) + ["hostname"]
    if partitions is not None:
        cands = cands.repartition(partitions, *hostkeys[:1])
        reduce_first = False
    if code_col:
        reduce_first = False
    if reduce_first:
        # map-side-combinable pre-reduction: only the earliest
        # occurrence per (host, key, synthflag) can ever be admitted
        # (monotonicity facts 1 & 2 above).
        others = [c for c in cands.columns
                  if c not in ("hostname", "scan_key", "synth_rank")]
        # struct min compares fields left-to-right: order keys first
        ordered = ["task_rank", "seq"] + [
            c for c in others if c not in ("task_rank", "seq")
        ]
        cands = (
            cands.groupBy("hostname", "scan_key", "synth_rank")
            .agg(F.min(F.struct(*[F.col(c) for c in ordered])).alias("_m"))
            .select("hostname", "scan_key", "synth_rank", "_m.*")
        )

    cp = F.coalesce(F.col("reqcount"), F.lit(0))
    # AQE picks broadcast vs shuffle for the budget join by size
    df = cands.join(host_budget, "hostname", "left")

    w_host = Window.partitionBy(*hostkeys).orderBy(
        *[F.col(c) for c in ORDER_COLS]
    )
    w_key = Window.partitionBy(*hostkeys, "scan_key").orderBy(
        *[F.col(c) for c in ORDER_COLS]
    )
    w_run = w_host.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    df = df.withColumn("_rn", F.row_number().over(w_host))
    # fact 3: synthetic rows survive only as row 1 of a fresh host
    df = df.filter((F.col("synth_rank") == 1) | ((F.col("_rn") == 1) & (cp == 0)))

    # ranks must be recomputed after the synthetic prune
    df = (
        df.withColumn("_rn", F.row_number().over(w_host))
        .withColumn("_dup_rn", F.row_number().over(w_key))
        .withColumn("_row0", (F.col("_rn") == 1) & (cp == 0))
        .withColumn("_survivor", (F.col("_dup_rn") == 1) & ~F.col("_row0"))
        .withColumn(
            "_sidx",
            F.sum(F.when(F.col("_survivor"), 1).otherwise(0)).over(w_run),
        )
    )
    # budget: C = cap + 1 - cp - (1 if the fresh-host row-0 admit used a slot)
    cap = F.lit(max_per_host + 1) - cp - F.when(cp == 0, 1).otherwise(0)
    admitted = df.filter(
        F.col("_row0") | (F.col("_survivor") & (F.col("_sidx") <= cap))
    )
    admitted = admitted.drop(
        "_rn", "_dup_rn", "_row0", "_survivor", "_sidx", "reqcount"
    )
    return admitted.drop(code_col) if code_col else admitted


def admit_wave_salted(
    cands: DataFrame,
    host_budget: DataFrame,
    max_per_host: int,
    salt_buckets: int,
    partitions: int,
    bucket_col: str | None = None,
) -> DataFrame:
    """Skew-proof admission fold: host-bucket salting for hot domains
    (north_rule). Exact — equals admit_wave on any input
    (tests/test_schedule_modes.py) — but a mega-host's candidates are
    processed across ``salt_buckets`` partitions instead of one.

    Phase 1 (salted, wide): bucket = xxhash64(scan_key) % S. Because
    the bucket is a pure function of the dedupe key, every key lives in
    exactly ONE (host, bucket) group, so the local first-occurrence
    window IS the global per-key dedupe. Each (host, bucket, synthflag)
    group then keeps its first cap+2 first-occurrence rows in candidate
    order. The +2 slack (not +1) is load-bearing: a globally-admitted
    row is among the first cap+1 *survivors* of its host, but its
    bucket-local rank can exceed its survivor index by one because two
    bucket-ranked rows are not survivors — the fresh-host row-0 admit
    (counted against the budget but excluded from the survivor index)
    and the one key that row 0 shadows (its later duplicate is
    bucket-ranked but dedupe-rejected). Keeping cap+2 per bucket
    therefore can never drop a row the exact fold would admit; do NOT
    tighten it to cap+1.

    Phase 2 (exact, tiny): ≤ S×(cap+2) rows per host flow into the
    ordinary window fold, which replays the sequential semantics
    (fresh-host synthetics, strict-'>' budget) exactly.

    ``bucket_col``: pass the name of a precomputed bucket column to
    reuse upstream (host, bucket) partitioning — e.g. straight out of a
    salted co-partitioned seen anti-join — making phase 1
    exchange-free; otherwise the bucket is derived and one explicit
    exchange on (hostname, bucket) is inserted.
    """
    if bucket_col is None:
        cands = cands.withColumn(
            "_salt_b", F.pmod(F.xxhash64("scan_key"), F.lit(salt_buckets))
        )
        cands = cands.repartition(partitions, "hostname", "_salt_b")
        bucket_col = "_salt_b"
    order = [F.col(c) for c in ORDER_COLS]
    w_key = Window.partitionBy(
        "hostname", bucket_col, "scan_key", "synth_rank"
    ).orderBy(*order)
    w_bucket = Window.partitionBy("hostname", bucket_col, "synth_rank").orderBy(
        *order
    )
    local = (
        cands.withColumn("_kr", F.row_number().over(w_key))
        .filter(F.col("_kr") == 1)
        .withColumn("_br", F.row_number().over(w_bucket))
        .filter(F.col("_br") <= max_per_host + 2)
        .drop("_kr", "_br", bucket_col)
    )
    return admit_wave(
        local, host_budget, max_per_host, reduce_first=False,
        partitions=partitions,
    )


def distributed_rank(
    df: DataFrame,
    order_cols: tuple,
    out: str,
    start: int = 0,
    super_shift: int = 20,
) -> DataFrame:
    """Global ``row_number() over (order by order_cols)`` WITHOUT a
    single-partition window (the 10^10-scale killer WindowExec warns
    about). Three levels, each partition-bounded:

    1. rank within ``lead``-buckets (``lead`` = the leading order
       column — the global order is lexicographic, so bucket order ==
       lead order): ``row_number`` over a window partitioned by lead.
    2. per-bucket row counts get cumulative offsets within a *super*
       bucket (``lead >> super_shift``): one row per bucket flows into
       a window partitioned by super — bounded by 2^super_shift rows.
    3. super-bucket totals (#buckets / 2^super_shift rows — metadata
       scale even at a 10^10 frontier) get prefix sums via a broadcast
       triangular join — no window, no collect, fully lazy.

    The final offsets table is one row per bucket; AQE broadcasts it
    back onto the bucket-partitioned ranked stream, so the whole rank
    costs the one hash exchange on ``lead`` (which callers typically
    already have). Exact parity with the single-window form whenever
    ``order_cols`` is a total order (no ties), which both call sites
    guarantee. ``lead`` must be a non-negative integer column.
    """
    lead, rest = order_cols[0], [F.col(c) for c in order_cols[1:]]
    w_local = Window.partitionBy(lead).orderBy(*rest)
    local = df.withColumn("_lr", F.row_number().over(w_local))
    counts = (
        local.groupBy(lead)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_sup", F.shiftright(F.col(lead).cast("long"), super_shift))
    )
    w_sup = Window.partitionBy("_sup").orderBy(lead).rowsBetween(
        Window.unboundedPreceding, -1
    )
    counts = counts.withColumn("_boff", F.coalesce(F.sum("_n").over(w_sup), F.lit(0)))
    sup_tot = counts.groupBy("_sup").agg(F.sum("_n").alias("_sn"))
    sup_off = (
        sup_tot.select(F.col("_sup").alias("_sa"))
        .join(
            F.broadcast(sup_tot.select(F.col("_sup").alias("_sb"), "_sn")),
            F.col("_sb") < F.col("_sa"),
            "left",
        )
        .groupBy("_sa")
        .agg(F.coalesce(F.sum("_sn"), F.lit(0)).alias("_soff"))
    )
    offsets = counts.join(
        F.broadcast(sup_off), counts["_sup"] == F.col("_sa")
    ).select(lead, (F.col("_boff") + F.col("_soff")).alias("_off"))
    return (
        local.join(F.broadcast(offsets), lead)
        .withColumn(out, F.col("_lr") + F.col("_off") + F.lit(start))
        .drop("_lr", "_off")
    )


def assign_discovery_order(
    admitted: DataFrame, start: int, out: str = "discovery_order"
) -> DataFrame:
    """Global FIFO enqueue rank for admitted tasks, continuing from
    ``start`` — two-phase distributed rank (no single-partition
    window), exact because ORDER_COLS is a total order over admitted
    rows (seq is unique within a task; synth_rank separates the one
    synthetic row)."""
    return distributed_rank(admitted, ORDER_COLS, out, start=start)


def politeness_slots(tasks: DataFrame, out: str = "slot") -> DataFrame:
    """Q2 politeness: within a wave, the k-th task of a host gets slot
    k — executors pace same-host fetches by slot (with robots
    crawl_delay as the spacing when present)."""
    w = Window.partitionBy("hostname").orderBy("discovery_order")
    return tasks.withColumn(out, F.row_number().over(w).cast("int"))


def authority_rank(
    tasks: DataFrame, host_priorities: DataFrame, out: str = "wave_rank"
) -> DataFrame:
    """Priority-crawl wave ordering (extension; the reference is
    strictly FIFO): remap a depth-frontier's task order to
    (host priority asc, discovery_order asc). Hosts absent from the
    priority table drain last, in discovery order.

    ``host_priorities``: (hostname, priority) with non-negative
    integral priorities — use ``rank_hosts_by_score`` to derive a
    dense per-host rank from authority scores (e.g. ``graph.pagerank``
    over the host link graph). Dense per-host ranks keep every
    ``distributed_rank`` bucket at one host's tasks (<= cap+1 rows);
    only the absent-host fallback bucket aggregates multiple hosts.

    The output rank is a total order (discovery_order is unique), so
    the admission fold downstream replays the sequential priority
    drain exactly — the same closed-form-fold argument as BFS, which
    never uses task_rank beyond its ordering.
    """
    pr = host_priorities.select(
        "hostname", F.col("priority").cast("long").alias("_hp")
    )
    j = tasks.join(pr, "hostname", "left").withColumn(
        "_prio", F.coalesce(F.col("_hp"), F.lit(1 << 62))
    )
    return distributed_rank(
        j, ("_prio", "discovery_order"), out, start=-1
    ).drop("_hp", "_prio")


def rank_hosts_by_score(
    scores: DataFrame, score_col: str = "score", out: str = "priority"
) -> DataFrame:
    """Dense host priorities from authority scores: rank hosts by
    (score desc, hostname asc) without a global window. Scores are
    quantized to 2^-30 buckets for the distributed rank's integer
    lead; hosts whose scores collide within a bucket order by
    hostname — deterministic either way."""
    q = scores.withColumn(
        "_neg",
        F.greatest(
            F.lit(0),
            ((1 << 30) - 1 - F.floor(F.col(score_col) * (1 << 30))).cast("long"),
        ),
    )
    return distributed_rank(q, ("_neg", "hostname"), out, start=-1).select(
        "hostname", out
    )


def crawl_makespan(
    tasks: DataFrame,
    delays: DataFrame,
    workers: tuple = (8, 32),
    fetch_ms: int = 200,
    host_col: str = "hostname",
) -> DataFrame:
    """Politeness-constrained capacity planner: how long must this
    frontier take at W executors? Per-host fetches are serialized by
    politeness (spacing = max(crawl_delay_ms, fetch_ms) — a host's
    queue cannot be parallelized without violating Q2), so the
    per-host serial time n_h x spacing_h is irreducible, and the
    classic two-sided makespan lower bound applies per worker count:
    LB(W) = max(max_h host_ms, ceil(total_ms / W)). The ratio
    total/(W x LB) is the best-case utilization — the number that
    says whether adding executors still buys wall-clock (the 10^10
    planning question: past W* = total/max_host, the slowest HOST is
    the bottleneck, not the cluster).

    Scale shape: ONE host-keyed count agg (map-side combined) + a
    broadcast join with the metadata-sized delay table + a 1-row
    aggregate exploded per worker count. Integer arithmetic
    throughout (utilization rounded at 6) — bit-exact oracle.

    Returns one row per W: (n_workers, n_hosts, n_tasks, max_host_ms,
    total_ms, makespan_lb_ms, utilization).
    """
    d = delays.select(
        F.col(delays.columns[0]).alias("_h"),
        F.col(delays.columns[1]).cast("long").alias("_delay"),
    )
    per_host = (
        tasks.groupBy(F.col(host_col).alias("_h"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(F.broadcast(d), "_h", "left")
        .select(
            "_n",
            (
                F.col("_n")
                * F.greatest(
                    F.coalesce(F.col("_delay"), F.lit(0)),
                    F.lit(int(fetch_ms)),
                )
            ).alias("_host_ms"),
        )
    )
    totals = per_host.agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        F.sum("_n").cast("long").alias("n_tasks"),
        F.max("_host_ms").cast("long").alias("max_host_ms"),
        F.sum("_host_ms").cast("long").alias("total_ms"),
    )
    ws = F.array(*[F.lit(int(w)) for w in workers])
    out = totals.select(
        F.explode(ws).alias("n_workers"),
        "n_hosts",
        "n_tasks",
        "max_host_ms",
        "total_ms",
    ).select(
        "n_workers",
        "n_hosts",
        "n_tasks",
        "max_host_ms",
        "total_ms",
        F.greatest(
            F.col("max_host_ms"),
            F.ceil(F.col("total_ms") / F.col("n_workers")).cast("long"),
        ).alias("makespan_lb_ms"),
    )
    return out.select(
        "*",
        F.round(
            F.col("total_ms")
            / (F.col("n_workers") * F.col("makespan_lb_ms")),
            6,
        ).alias("utilization"),
    )
