"""Stateless filter predicates F1-F7, F10, F13 (SURVEY.md §2.3) as
composable Column expressions over the derived-URL struct.

These are *pure* predicates — in the reference they sit interleaved
with stateful checks inside ``valid_task_url`` (redis_utils.py:168-196)
but have no side effects, so hoisting them ahead of the stateful
scanned/budget fold is semantics-preserving (a row they reject never
mutates Redis in the reference either). Catalyst then pushes them
down to the scan/extraction side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def valid_url(u: str = "u") -> Column:
    """F4 — canonicalization produced a usable URL."""
    return F.col(f"{u}.valid")


def not_blocked_ext_or_host(u: str = "u") -> Column:
    """F1 + F3 (url.py:136-138) — extension/host blocklists, computed
    inside the derive UDF as ``blocked``."""
    return ~F.col(f"{u}.blocked")


def not_alicdn(u: str = "u") -> Column:
    """F7 (redis_utils.py:178-182) — ``.../??css/a.css,b.css`` files."""
    return ~F.col(f"{u}.alicdn")


def not_blocklisted(blocklist: list, u: str = "u") -> Column:
    """F10 (redis_utils.py:198-216) — registered domain or any
    subdomain-suffix in the blocklist. ``block_names`` already holds
    the full suffix walk, so membership is one arrays_overlap against
    a literal (broadcast-sized) list."""
    if not blocklist:
        return F.lit(True)
    lit = F.array(*[F.lit(x) for x in sorted(set(blocklist))])
    return ~F.arrays_overlap(F.col(f"{u}.block_names"), lit)


def frontier_not_blocklisted(
    blocklist: list, hostname_col: str = "hostname", domain_col: str = "domain"
) -> Column:
    """F10 re-check over frontier columns only (consumer.py:38): the
    reference walk is [domain] plus every subdomain-suffix of hostname
    down to domain — i.e. all dot-suffixes of hostname with
    label-count between |domain| and |hostname|. Computed as JVM
    string ops over the persisted (hostname, domain) pair, so the
    wave's critical path never re-derives the URL struct or touches
    the PSL. Rows with NULL domain (stores committed before the
    frontier carried it) use the conservative all-suffixes walk
    (>= 2 labels), identical to the reference walk unless a blocklist
    entry is itself a public suffix."""
    if not blocklist:
        return F.lit(True)
    lit = F.array(*[F.lit(x) for x in sorted(set(blocklist))])
    parts = F.split(F.col(hostname_col), r"\.")
    n = F.size(parts)
    dn = F.coalesce(
        F.size(F.split(F.col(domain_col), r"\.")), F.least(F.lit(2), n)
    )
    walk = F.transform(
        F.sequence(dn, n),
        lambda k: F.concat_ws(".", F.slice(parts, n - k + 1, k)),
    )
    return ~F.arrays_overlap(walk, lit)


def method_is_get(method_col: str = "method") -> Column:
    """F13 (producer.py:98-108) — only GET is ever scheduled."""
    return F.col(method_col) == "GET"


def stateless_valid(blocklist: list, u: str = "u") -> Column:
    """F1/F3 -> F7 -> F10 conjunction (the F14 ordering matters only
    through side effects, which these don't have)."""
    return (
        valid_url(u)
        & not_blocked_ext_or_host(u)
        & not_alicdn(u)
        & not_blocklisted(blocklist, u)
    )


def detect_pattern_traps(
    df: DataFrame,
    host_col: str = "hostname",
    url_col: str = "url",
    pattern_col: str = "pattern",
    min_urls: int = 100,
    max_patterns_per_url: float = 0.5,
) -> DataFrame:
    """Crawler-trap detection by URL-pattern explosion — an admission
    heuristic the reference lacks but any 10^10-frontier crawl needs:
    its scanned-set dedupe (F8) keys on the digit-normalized pattern
    (T2), so a host whose URL space keeps minting NEW patterns
    (session ids in the path, calendar links, faceted search) defeats
    the dedupe and eats the whole per-host budget on junk. Per host:
    distinct discovered URLs, distinct patterns they collapse to, and
    ``is_trap`` when a host has >= ``min_urls`` URLs AND more than
    ``max_patterns_per_url`` patterns per URL (little collapse = the
    pattern key is not protecting us). Feed trap hosts into the
    runtime blocklist (Q7) or a reduced budget.

    Scale: one hash aggregation keyed on the host — countDistinct
    plans as partial aggs on (host, url) / (host, pattern); no joins,
    no windows, no skew beyond the host key itself (hot hosts are
    exactly what AQE skew-split handles).

    Output: (host_col, n_urls, n_patterns, patterns_per_url, is_trap).
    """
    return (
        df.groupBy(host_col)
        .agg(
            F.countDistinct(url_col).alias("n_urls"),
            F.countDistinct(pattern_col).alias("n_patterns"),
        )
        .select(
            host_col,
            "n_urls",
            "n_patterns",
            F.round(F.col("n_patterns") / F.col("n_urls"), 6).alias(
                "patterns_per_url"
            ),
            (
                (F.col("n_urls") >= min_urls)
                & (
                    F.col("n_patterns")
                    > F.lit(float(max_patterns_per_url)) * F.col("n_urls")
                )
            ).alias("is_trap"),
        )
    )


# RefinedWeb §G.1-style URL keyword filtering: a neutral default list
# of spam-signal words standing in for the UT1-derived production
# lists (the list is a parameter; production swaps in its own).
DEFAULT_URL_BLOCK_KEYWORDS = (
    "betting", "casino", "escort", "lottery", "pills",
    "poker", "porn", "torrent", "viagra", "webcam", "xxx",
)


def url_keyword_score(
    df: DataFrame,
    url_col: str = "url",
    keywords: tuple = DEFAULT_URL_BLOCK_KEYWORDS,
    threshold: int = 2,
) -> DataFrame:
    """URL-level quality gate (RefinedWeb §G.1 simplified): curation
    pipelines drop documents on the URL alone before fetching or
    scoring text — the cheapest filter in the stack, and the only one
    that saves the fetch itself when applied at admission time.

    Scoring: the lowercased URL is split into words on non-alphanumeric
    runs; a keyword appearing as a whole word counts 2 (strict hit), a
    keyword appearing only as a substring counts 1 (soft hit — catches
    'pornhub' without banning 'scunthorpe'-style false positives at
    full weight); ``keep`` = score < threshold, so one strict hit or
    two soft hits drop the URL by default.

    All-JVM and shuffle-free: the keyword list is a literal array
    (bounded, UT1-scale lists are thousands of entries — still literal
    or a broadcast join at worst), the word split + membership are
    higher-order array functions inside whole-stage codegen. Integer
    score so the output is hash-stable across engines.

    Output: (url_col..., strict_hits, soft_hits, url_score, keep).
    """
    strict, soft = _url_keyword_hits(url_col, keywords)
    return (
        df.withColumn("strict_hits", strict)
        .withColumn("soft_hits", soft)
        .withColumn(
            "url_score", (F.col("strict_hits") * 2 + F.col("soft_hits"))
        )
        .withColumn("keep", F.col("url_score") < F.lit(int(threshold)))
    )


def url_keyword_keep(
    url_col: str = "url",
    keywords: tuple = DEFAULT_URL_BLOCK_KEYWORDS,
    threshold: int = 2,
) -> Column:
    """Predicate form of :func:`url_keyword_score` for the stateless
    filter chain (composes with ``stateless_valid``; opt-in via
    ``CrawlConfig.url_block_keywords``)."""
    strict, soft = _url_keyword_hits(url_col, keywords)
    return (strict * 2 + soft) < F.lit(int(threshold))


def _url_keyword_hits(url_col: str, keywords: tuple):
    lower = F.lower(F.col(url_col))
    words = F.filter(
        F.split(lower, "[^a-z0-9]+"), lambda w: w != F.lit("")
    )
    kw = F.array(*[F.lit(k) for k in keywords])
    strict = F.size(F.filter(kw, lambda k: F.array_contains(words, k)))
    soft = F.size(
        F.filter(
            kw,
            lambda k: lower.contains(k) & ~F.array_contains(words, k),
        )
    )
    return strict, soft


def is_target(df: DataFrame, whitelist_df: DataFrame, tld: bool, u: str = "u") -> DataFrame:
    """F11 (redis_utils.py:129-137) — scope membership on registered
    domain (tld mode) or hostname, via broadcast semi-join; adds an
    ``is_target`` boolean column."""
    key = F.col(f"{u}.domain") if tld else F.col(f"{u}.hostname")
    wl = F.broadcast(whitelist_df.select(F.col("scope_key")).distinct())
    return df.join(
        wl.withColumn("_wl", F.lit(True)), key == F.col("scope_key"), "left"
    ).withColumn("is_target", F.coalesce(F.col("_wl"), F.lit(False))).drop(
        "scope_key", "_wl"
    )
