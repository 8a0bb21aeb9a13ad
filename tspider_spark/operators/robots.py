"""robots.txt scoping + crawl-delay politeness (north_rule extension;
FIXTURES.md §A4 — NOT present in the reference, which fetches
unconditionally; an empty rules table preserves reference parity).

Rules table: ``robots(host string, disallow_prefixes array<string>,
crawl_delay_ms int)``. Rules are broadcast to executors; the disallow
check is a JVM ``exists`` over the prefix array (no Python), and
crawl_delay scales each task's politeness slot into a planned fetch
offset so executors can pace same-host requests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("disallow_prefixes", ArrayType(StringType())),
        StructField("crawl_delay_ms", IntegerType()),
    ]
)


def robots_filter(
    cands: DataFrame, robots: DataFrame, host_col: str = "hostname",
    path_col: str = "u.path",
) -> DataFrame:
    """Drop candidates whose path starts with any disallow prefix for
    their host. Broadcast join; hosts without rules pass."""
    r = F.broadcast(robots.select(
        F.col("host").alias("_rhost"), "disallow_prefixes"
    ))
    joined = cands.join(r, F.col(host_col) == F.col("_rhost"), "left")
    path = F.col(path_col)
    disallowed = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array()),
        lambda p: path.startswith(p),
    )
    return joined.filter(~disallowed).drop("_rhost", "disallow_prefixes")


def apply_crawl_delay(
    tasks: DataFrame, robots: DataFrame, host_col: str = "hostname",
    slot_col: str = "slot", out: str = "planned_offset_ms",
) -> DataFrame:
    """Politeness pacing: the k-th same-host task in a wave is planned
    at (k-1) * crawl_delay_ms. Hosts without a rule get 0 (reference
    parity: no delay semantics exist in TSpider's scheduler; its
    pacing came from rendering latency)."""
    r = F.broadcast(robots.select(F.col("host").alias("_rhost"), "crawl_delay_ms"))
    joined = tasks.join(r, F.col(host_col) == F.col("_rhost"), "left")
    delay = F.coalesce(F.col("crawl_delay_ms"), F.lit(0))
    return joined.withColumn(
        out, ((F.col(slot_col) - 1) * delay).cast("long")
    ).drop("_rhost", "crawl_delay_ms")


def parse_robots(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Parse raw robots.txt bodies into the ROBOTS_SCHEMA rules table
    (simplified RFC 9309, ``User-agent: *`` groups only — the crawler
    presents no specific agent token).

    Declarative parse, no Python: explode lines, strip comments,
    split ``key: value``, then gaps-and-islands over the line
    positions (a User-agent line that follows a non-User-agent line
    opens a new group) with a per-host window — partition-bounded by
    one host's robots body, never global. Groups whose agent set
    contains ``*`` contribute their Disallow prefixes (non-empty
    values; sorted distinct for determinism) and the minimum
    Crawl-delay (seconds -> ms). Hosts with no matching group are
    absent (= unrestricted, reference parity)."""
    lines = _grouped_lines(bodies, host_col, body_col)
    groups = (
        lines.groupBy("host", "grp")
        .agg(
            F.max(
                ((F.col("key") == "user-agent") & (F.col("val") == "*")).cast("int")
            ).alias("_star"),
            F.sort_array(
                F.collect_set(
                    F.when(
                        (F.col("key") == "disallow") & (F.col("val") != ""),
                        F.col("val"),
                    )
                )
            ).alias("_prefixes"),
            F.min(
                F.when(
                    F.col("key") == "crawl-delay",
                    F.col("val").cast("double"),
                )
            ).alias("_delay_s"),
        )
        .filter(F.col("_star") == 1)
    )
    return (
        groups.groupBy("host")
        .agg(
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("_prefixes")))
            ).alias("disallow_prefixes"),
            (F.min("_delay_s") * 1000).cast("int").alias("crawl_delay_ms"),
        )
    )


def _grouped_lines(
    bodies: DataFrame, host_col: str, body_col: str
) -> DataFrame:
    """Shared robots.txt line machinery: CRLF-tolerant line explode,
    comment strip, ``key: value`` split, gaps-and-islands UA grouping
    (per-host windows — partition-bounded by one body, never global).
    Returns (host, pos, key, val, grp)."""
    from pyspark.sql.window import Window

    lines = bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            # CRLF-tolerant: \r is not in trim's strip set
            F.split(F.regexp_replace(F.col(body_col), "\r", ""), "\n")
        ).alias("pos", "raw"),
    )
    cleaned = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    lines = (
        lines.withColumn("line", cleaned)
        .filter(F.col("line").contains(":"))
        .withColumn("key", F.lower(F.trim(F.substring_index("line", ":", 1))))
        .withColumn(
            "val", F.trim(F.expr("substring(line, instr(line, ':') + 1)"))
        )
    )
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = (F.col("key") == "user-agent").cast("int")
    lines = lines.withColumn("_ua", is_ua).withColumn(
        "_new",
        ((F.col("_ua") == 1) & (F.lag("_ua", 1, 0).over(w) == 0)).cast("int"),
    )
    return lines.withColumn("grp", F.sum("_new").over(w))


def parse_robots_rules(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Full-precedence rule extraction: (host, prefix, allow) rows for
    every non-empty ``Allow``/``Disallow`` line in ``User-agent: *``
    groups — the input :func:`robots_filter_precedence` needs for RFC
    9309 §2.2.2 longest-match evaluation (which :func:`parse_robots`'s
    disallow-only summary cannot express: an ``Allow: /dir/public``
    carving a hole in ``Disallow: /dir`` is invisible there).

    Same declarative shape as parse_robots (shared
    :func:`_grouped_lines` machinery); distinct (host, prefix,
    allow)."""
    lines = _grouped_lines(bodies, host_col, body_col)
    star = (
        lines.groupBy("host", "grp")
        .agg(
            F.max(
                ((F.col("key") == "user-agent") & (F.col("val") == "*"))
                .cast("int")
            ).alias("_star")
        )
        .filter(F.col("_star") == 1)
        .select("host", "grp")
    )
    return (
        lines.join(star, ["host", "grp"], "left_semi")
        .filter(F.col("key").isin("allow", "disallow") & (F.col("val") != ""))
        .select(
            "host",
            F.col("val").alias("prefix"),
            (F.col("key") == "allow").alias("allow"),
        )
        .distinct()
    )


def robots_filter_precedence(
    cands: DataFrame,
    rules: DataFrame,
    host_col: str = "hostname",
    path_col: str = "u.path",
) -> DataFrame:
    """RFC 9309 §2.2.2 evaluation: among the rules whose prefix
    matches the path, the LONGEST prefix wins; at equal length an
    Allow beats a Disallow; no matching rule (or no rules for the
    host) = allowed. Supersedes :func:`robots_filter` when Allow
    directives matter.

    Physical: per-host rules aggregate into one array (robots files
    are KB-scale — the per-host rule count is bounded by the file) and
    broadcast; the longest-match scan is ONE in-array JVM fold per
    candidate, shuffle-free on the candidate side."""
    per_host = rules.groupBy(F.col("host").alias("_rhost")).agg(
        F.sort_array(F.collect_list(F.struct("prefix", "allow"))).alias(
            "_rules"
        )
    )
    joined = cands.join(
        F.broadcast(per_host), F.col(host_col) == F.col("_rhost"), "left"
    )
    path = F.col(path_col)
    matched = F.filter(
        F.coalesce(
            F.col("_rules"),
            F.array().cast("array<struct<prefix:string,allow:boolean>>"),
        ),
        lambda r: path.startswith(r["prefix"]),
    )
    # fold to max by (prefix length, allow-wins-ties); init = allowed
    best = F.aggregate(
        matched,
        F.struct(F.lit(-1).alias("len"), F.lit(True).alias("allow")),
        lambda a, r: F.when(
            F.length(r["prefix"]) > a["len"],
            F.struct(
                F.length(r["prefix"]).alias("len"), r["allow"].alias("allow")
            ),
        )
        .when(
            F.length(r["prefix"]) == a["len"],
            F.struct(
                a["len"].alias("len"), (a["allow"] | r["allow"]).alias("allow")
            ),
        )
        .otherwise(a),
    )
    return joined.filter(best["allow"]).drop("_rhost", "_rules")


def robots_sitemap_urls(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Extract ``Sitemap:`` directive URLs from robots.txt bodies —
    the discovery edge RFC 9309 §2.3 defines OUTSIDE user-agent groups
    (any group membership is ignored; the directive is global to the
    file). Closes the crawl seed-discovery loop:
    ``parse_robots`` scopes fetching, this feeds :func:`parse_sitemap`
    whose non-index rows feed ``CrawlEngine.seed()``.

    Pure JVM and shuffle-free like :func:`parse_sitemap`: one
    line-explode per body, comment/CRLF/case tolerant (the key is
    case-insensitive per RFC; the URL value is not case-folded).
    Returns distinct (host, sitemap_url) rows, keeping only absolute
    http(s) URLs (relative Sitemap values are invalid per the RFC and
    dropped)."""
    lines = bodies.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.split(F.regexp_replace(F.col(body_col), "\r", ""), "\n")
        ).alias("raw"),
    )
    cleaned = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    parsed = (
        lines.withColumn("line", cleaned)
        .filter(F.col("line").contains(":"))
        .withColumn("key", F.lower(F.trim(F.substring_index("line", ":", 1))))
        .withColumn(
            "val", F.trim(F.expr("substring(line, instr(line, ':') + 1)"))
        )
        .filter(F.col("key") == "sitemap")
        .filter(
            F.col("val").startswith("http://")
            | F.col("val").startswith("https://")
        )
    )
    return parsed.select("host", F.col("val").alias("sitemap_url")).distinct()


def parse_sitemap(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Extract seed URLs from sitemap bodies — XML urlset/sitemapindex
    (``<loc>`` entries, CDATA tolerated, entity-decoded for the five
    XML predefined entities) or plain text (one URL per line).

    Returns (host, url, is_index) where is_index marks entries from a
    ``<sitemap>`` index block (pointers to further sitemaps, not page
    seeds). Pure JVM: regexp_extract_all over the body — shuffle-free,
    one output row per <loc>; feeds CrawlEngine.seed()."""
    xml = F.col(body_col).contains("<urlset") | F.col(body_col).contains(
        "<sitemapindex"
    )
    locs = F.expr(
        f"regexp_extract_all({body_col}, "
        "'<loc>\\\\s*(?:<!\\\\[CDATA\\\\[)?([^<\\\\]\\\\s]+)', 1)"
    )
    plain = F.filter(
        F.transform(
            F.split(F.regexp_replace(F.col(body_col), "\r", ""), "\n"),
            lambda l: F.trim(l),
        ),
        lambda l: l.startswith("http://") | l.startswith("https://"),
    )
    entries = F.when(xml, locs).otherwise(plain)
    out = bodies.select(
        F.col(host_col).alias("host"),
        F.col(body_col).alias("_body"),
        F.explode(entries).alias("_raw"),
    )
    url = F.col("_raw")
    for ent, ch in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&apos;", "'"),
    ):
        url = F.replace(url, F.lit(ent), F.lit(ch))
    # a <loc> belongs to a sitemap index iff the body is a
    # <sitemapindex> document (urlset and index are never mixed)
    return out.select(
        "host",
        url.alias("url"),
        F.col("_body").contains("<sitemapindex").alias("is_index"),
    )


# regex metacharacters escaped when compiling an RFC 9309 pattern —
# everything except '*' (compiled to '.*' afterwards); a trailing '$'
# is stripped first (end anchor), so any '$' here is mid-pattern
# literal. '\' must go first.
_RX_ESCAPES = ["\\", ".", "+", "?", "(", ")", "[", "]", "{", "}", "|", "^", "$"]


def rule_regex(prefix_col) -> "F.Column":
    """RFC 9309 §2.2.3 pattern → anchored regex string, built from
    LITERAL replaces only, so the DuckDB oracle can produce the
    byte-identical regex (Java regex and RE2 agree on the generated
    constructs: escaped literals, ``.*``, ``^``/``$``). ``*`` matches
    any character sequence; a TRAILING ``$`` anchors the match end
    (mid-pattern ``$`` stays literal)."""
    p = F.col(prefix_col) if isinstance(prefix_col, str) else prefix_col
    ends = p.endswith("$")
    body = F.when(ends, p.substr(F.lit(1), F.length(p) - 1)).otherwise(p)
    for ch in _RX_ESCAPES:
        body = F.replace(body, F.lit(ch), F.lit("\\" + ch))
    body = F.replace(body, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), body, F.when(ends, F.lit("$")).otherwise(F.lit(""))
    )


def robots_filter_wildcard(
    cands: DataFrame,
    rules: DataFrame,
    host_col: str = "hostname",
    path_col: str = "path",
) -> DataFrame:
    """Full RFC 9309 §2.2.2-§2.2.3 evaluation WITH wildcards: rules
    may contain ``*`` (any sequence) and a trailing ``$`` (end
    anchor); among the rules whose pattern matches the path the
    LONGEST pattern wins and Allow beats Disallow on ties; no match =
    allowed. Supersedes :func:`robots_filter_precedence` when
    wildcard rules exist (prefix rules behave identically here).

    Physical shape unchanged from the prefix version: per-host rule
    arrays broadcast, ONE in-array JVM pass per candidate. The
    precedence fold collapses to integer arithmetic — matched rules
    map to ``2·len(pattern) + is_allow`` and ``array_max`` picks the
    winner (odd = allowed), so no struct fold and the same expression
    runs in the oracle."""
    per_host = rules.groupBy(F.col("host").alias("_rhost")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "prefix", "allow", rule_regex("prefix").alias("rx")
                )
            )
        ).alias("_rules")
    )
    joined = cands.join(
        F.broadcast(per_host), F.col(host_col) == F.col("_rhost"), "left"
    )
    path = F.col(path_col)
    empty = F.array().cast(
        "array<struct<prefix:string,allow:boolean,rx:string>>"
    )
    keys = F.transform(
        F.filter(
            F.coalesce(F.col("_rules"), empty),
            lambda r: F.regexp_like(path, r["rx"]),
        ),
        lambda r: F.length(r["prefix"]) * 2 + r["allow"].cast("int"),
    )
    best = F.array_max(keys)
    return joined.filter(best.isNull() | (best % 2 == 1)).drop(
        "_rhost", "_rules"
    )


# ---------------------------------------------------------------------------
# sitemap-driven frontier seeding (priority + recency)


def parse_sitemap_entries(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Full ``<url>``-block sitemap parse: unlike :func:`parse_sitemap`
    (which harvests bare ``<loc>`` seeds), this keeps the per-URL
    scheduling metadata the sitemaps.org protocol defines —
    ``<priority>`` (default 0.5 per the spec when absent) and
    ``<lastmod>`` (W3C date, null when absent) — so the frontier can
    rank sitemap seeds instead of admitting them FIFO. The reference
    has no sitemap stage at all (its seeds are CLI/file,
    ``tspider.py:33-60``); this is a north-rule frontier extension.

    Pure JVM and shuffle-free: one ``regexp_extract_all`` splits the
    body into ``<url>`` blocks (one output row per block after the
    explode), then per-block ``regexp_extract`` pulls loc / priority /
    lastmod; loc is entity-decoded for the five XML predefined
    entities. Blocks without a ``<loc>`` are dropped.

    Returns (host, url, priority double, lastmod date).
    """
    blocks = F.expr(
        f"regexp_extract_all({body_col}, '<url>(.*?)</url>', 1)"
    )
    out = bodies.select(
        F.col(host_col).alias("host"), F.explode(blocks).alias("_blk")
    )
    loc = F.regexp_extract(
        F.col("_blk"), "<loc>\\s*(?:<!\\[CDATA\\[)?([^<\\]\\s]+)", 1
    )
    pri = F.regexp_extract(F.col("_blk"), "<priority>([0-9.]+)</priority>", 1)
    mod = F.regexp_extract(
        F.col("_blk"), "<lastmod>([0-9]{4}-[0-9]{2}-[0-9]{2})", 1
    )
    url = loc
    for ent, ch in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&apos;", "'"),
    ):
        url = F.replace(url, F.lit(ent), F.lit(ch))
    return out.filter(loc != "").select(
        "host",
        url.alias("url"),
        F.when(pri == "", F.lit(0.5))
        .otherwise(pri.cast("double"))
        .alias("priority"),
        F.when(mod == "", F.lit(None).cast("date"))
        .otherwise(F.to_date(mod))
        .alias("lastmod"),
    )


def sitemap_seed_rank(
    entries: DataFrame,
    ref_date: str,
    half_life_days: float = 30.0,
    age_cap_days: int = 365,
    top_k: int = 3,
) -> DataFrame:
    """Rank sitemap entries into per-host seed lists for the frontier:
    score = priority / (1 + age_days / half_life) — the spec's
    priority damped by staleness. The decay is RATIONAL arithmetic
    (one divide + one add), not exp()/pow(): IEEE divides round
    identically on the JVM and DuckDB, so scores are bit-reproducible
    across engines where a libm pow() is not (the classifier-training
    lesson at classify.py:222). Missing lastmod ages to
    ``age_cap_days`` (an undated URL competes as maximally stale);
    future lastmod clamps to age 0.

    ``ref_date`` is an explicit 'YYYY-MM-DD' literal — "today" is a
    parameter, never a clock read, so replays are deterministic.

    Scale shape: one hash exchange on host for the row_number window —
    per-host sitemap cardinality is protocol-bounded (50k URLs/file),
    so no single window partition can be frontier-sized; ties break by
    url for total determinism. Returns (host, url, priority, age_days,
    score, seed_rank) with seed_rank <= top_k.
    """
    from pyspark.sql import Window

    age = F.when(
        F.col("lastmod").isNull(), F.lit(age_cap_days)
    ).otherwise(
        F.greatest(
            F.lit(0), F.datediff(F.to_date(F.lit(ref_date)), F.col("lastmod"))
        )
    )
    scored = entries.select(
        "host",
        "url",
        "priority",
        age.cast("int").alias("age_days"),
        F.round(
            F.col("priority")
            / (F.lit(1.0) + age.cast("double") / F.lit(half_life_days)),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("host").orderBy(
        F.col("score").desc(), F.col("url").asc()
    )
    return (
        scored.withColumn("seed_rank", F.row_number().over(w))
        .filter(F.col("seed_rank") <= top_k)
    )
