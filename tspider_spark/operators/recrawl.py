"""Recrawl scheduling: page-change-rate estimation from fetch history.

Cho & Garcia-Molina 2003 ("Estimating Frequency of Change", TOIT §4):
a crawler that refetches page i at times t_1..t_n and records a
content fingerprint each time observes X change-intervals out of n-1;
the naive X/(n-1) estimator is biased (a page can change twice inside
one interval and be counted once), and their bias-corrected MLE for
the Poisson change rate is

    r_hat = -ln((n_bar - X + 0.5) / (n_bar + 0.5)),   n_bar = n - 1

changes per *interval*, which divided by the mean interval gives the
per-second rate lambda. The scheduler then prioritizes by expected
staleness: P(changed since last fetch at time T) = 1 - exp(-lambda *
(T - t_n)) — refetch what is most likely stale, not what is oldest.

This is the reference crawler's missing half (TSpider crawls once and
stops; `tspider.py` has no refresh loop) and the standard production
extension for a frontier that runs continuously. Input is exactly
what the engine's fetch lineage provides: one row per (url,
fetched_at, fingerprint) observation.

Scale shape: ONE hash exchange keyed on url; the per-url history
window is bounded by that url's observation count (a recrawl log
keeps tens of observations per url, not millions — no hot keys by
construction since the partition key is the url itself). Everything
is JVM expressions inside whole-stage codegen; no Python.
Timestamps are compared as epoch seconds via ``unix_micros`` (exact
integer microseconds, timezone-free) and the evaluation instant is an
explicit epoch-seconds parameter — never ``now()`` — so runs are
deterministic and engine-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def recrawl_priority(
    obs: DataFrame,
    as_of_epoch: float,
    url: str = "url",
    at: str = "fetched_at",
    fp: str = "fingerprint",
) -> DataFrame:
    """Per-URL change-rate estimate + staleness priority.

    ``obs``: (url, fetched_at timestamp, fingerprint) fetch log.
    ``as_of_epoch``: epoch seconds the staleness is evaluated at.

    Returns one row per url with >= 2 observations AND a positive
    observation span: (url, n_obs, n_changes, change_rate_per_day,
    p_stale) — ``change_rate_per_day`` the bias-corrected Poisson rate
    scaled to days, ``p_stale`` = P(page changed since its last
    fetch); both rounded to 6 places. Feed a refetch-budget filter or
    priority ordering with ``p_stale`` as the score.
    """
    w = Window.partitionBy(url).orderBy(at, fp)
    if dict(obs.dtypes).get(at) == "timestamp_ntz":
        # parquet wall-clock timestamps: pure NTZ arithmetic, no
        # session-timezone dependence (matches DuckDB's epoch(ts))
        micros = F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {at})"
        )
    else:
        micros = F.unix_micros(F.col(at))
    e = micros.cast("double") / F.lit(1000000.0)
    d = (
        obs.select(
            url,
            e.alias("_e"),
            F.col(fp),
            F.when(
                F.lag(fp).over(w).isNotNull()
                & (F.col(fp) != F.lag(fp).over(w)),
                1,
            )
            .otherwise(0)
            .alias("_chg"),
        )
        .groupBy(url)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("_chg").cast("long").alias("n_changes"),
            F.min("_e").alias("_t0"),
            F.max("_e").alias("_tn"),
        )
        # degenerate histories (single fetch, or every fetch at one
        # instant) carry no rate information — excluded, not NULLed
        .filter((F.col("n_obs") >= 2) & (F.col("_tn") > F.col("_t0")))
    )
    nbar = (F.col("n_obs") - 1).cast("double")
    x = F.col("n_changes").cast("double")
    r_hat = -F.log((nbar - x + 0.5) / (nbar + 0.5))  # changes/interval
    lam_sec = r_hat * nbar / (F.col("_tn") - F.col("_t0"))  # changes/sec
    since = F.greatest(
        F.lit(float(as_of_epoch)) - F.col("_tn"), F.lit(0.0)
    )
    p_stale = F.lit(1.0) - F.exp(-lam_sec * since)
    return d.select(
        url,
        "n_obs",
        "n_changes",
        F.round(lam_sec * 86400.0, 6).alias("change_rate_per_day"),
        F.round(p_stale, 6).alias("p_stale"),
    )


def recrawl_oracle_sql(obs_cte: str, as_of_epoch: float) -> str:
    """DuckDB twin of :func:`recrawl_priority` over an ``obs`` CTE
    with columns (url, fetched_at, fingerprint)."""
    return f"""
 with {obs_cte},
 lagged as (
   select url,
          extract(epoch from fetched_at) as e,
          case when lag(fingerprint) over
                 (partition by url order by fetched_at, fingerprint)
                 is not null
                and fingerprint <> lag(fingerprint) over
                 (partition by url order by fetched_at, fingerprint)
               then 1 else 0 end as chg
   from obs
 ),
 agg as (
   select url, count(*) as n_obs, cast(sum(chg) as bigint) as n_changes,
          min(e) as t0, max(e) as tn
   from lagged group by url
   having count(*) >= 2 and max(e) > min(e)
 ),
 rates as (
   select url, n_obs, n_changes,
          -ln((cast(n_obs - 1 as double) - n_changes + 0.5)
              / (cast(n_obs - 1 as double) + 0.5))
            * (n_obs - 1) / (tn - t0) as lam_sec,
          greatest(cast({as_of_epoch!r} as double) - tn, 0.0) as since
   from agg
 )
 select url, n_obs, n_changes,
        round(lam_sec * 86400.0, 6) as change_rate_per_day,
        round(1.0 - exp(-lam_sec * since), 6) as p_stale
 from rates
"""


def aimd_concurrency(
    fetch_log: DataFrame,
    err_threshold: float = 0.3,
    c_max: float = 8.0,
    host_col: str = "hostname",
    wave_col: str = "wave",
    err_col: str = "is_err",
) -> DataFrame:
    """Adaptive per-host politeness via AIMD (the TCP congestion rule,
    and what production crawlers actually run — a fixed crawl delay is
    the reference's answer, this is the continuous one): walk each
    host's per-wave error history in wave order; a clean wave adds one
    concurrency slot (additive increase, capped at ``c_max``), an
    error-heavy wave (err rate > ``err_threshold``) halves it
    (multiplicative decrease, floored at 1).

    The fold is inherently sequential per host but bounded by the
    number of WAVES (tiny), so it runs as one JVM ``aggregate`` over a
    wave-sorted in-row array — per-host state never leaves the row,
    no iteration, no Python, one shuffle on the host. Halving stays
    exact in binary doubles, so the DuckDB twin (list_reduce with a
    prepended initial state — DuckDB's reduce takes no init) replays
    it bit-for-bit.

    Returns (hostname, n_waves, final_concurrency).
    """
    per_wave = (
        fetch_log.groupBy(host_col, wave_col)
        .agg(F.avg(F.col(err_col).cast("double")).alias("_er"))
        .select(
            host_col,
            F.struct(
                F.col(wave_col).alias("wave"),
                (F.col("_er") > err_threshold).cast("double").alias("bad"),
            ).alias("_o"),
        )
    )
    folded = per_wave.groupBy(host_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_waves"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list("_o")), lambda o: o["bad"]
            ),
            F.lit(1.0),
            lambda c, o: F.when(
                o == 1.0, F.greatest(F.lit(1.0), c / 2)
            ).otherwise(F.least(F.lit(float(c_max)), c + 1)),
        ).alias("final_concurrency"),
    )
    return folded.select(host_col, "n_waves", "final_concurrency")


def aimd_oracle_sql(
    log_cte: str,
    err_threshold: float = 0.3,
    c_max: float = 8.0,
) -> str:
    """DuckDB twin of :func:`aimd_concurrency`; ``log_cte`` must
    define ``log(hostname, wave, is_err)``. DuckDB's list_reduce has
    no initial-value argument, so the initial state 1.0 is PREPENDED
    to the outcome list (first element becomes the accumulator —
    positionally identical to Spark's aggregate(arr, 1.0, ...))."""
    return f"""
 with {log_cte},
 pw as (
   select hostname, wave,
          (avg(is_err::double) > {err_threshold!r})::int::double as bad
   from log group by 1, 2
 ),
 arrs as (
   select hostname, count(*)::bigint as n_waves,
          list_prepend(cast(1.0 as double), list(bad order by wave))
            as outcomes
   from pw group by 1
 )
 select hostname, n_waves,
        list_reduce(outcomes,
          (c, o) -> case when o = 1.0
                         then greatest(cast(1.0 as double), c / 2)
                         else least(cast({c_max!r} as double), c + 1) end)
          as final_concurrency
 from arrs"""
