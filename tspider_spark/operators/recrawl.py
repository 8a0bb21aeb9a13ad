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
