"""Vectorized URL derivation — hybrid JVM/Arrow.

The reference materializes a URL value object per record in Python
(url.py:30-138). Here the projection T1-T8 runs on TWO paths:

* **JVM fast path** (whole-stage codegen, zero Python): URLs matching
  a strict "plain http(s)" shape — lowercase scheme, safe host/path/
  query charset, no percent-encoding, no params, no userinfo — are
  derived with built-in expressions. Extracted crawl candidates are
  already scheme-validated and JS-normalized, so in practice almost
  every row takes this path.
* **Arrow fallback**: everything else goes through ONE
  struct-returning pandas UDF that wraps the exact pure-Python
  semantics (unique URLs parsed once per batch, reindexed back).

The two paths are proven equivalent on the fast path's domain by
tests/test_urlfuncs.py::TestHybridEquivalence — any URL where they
could diverge is excluded from the fast path by the eligibility regex.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from tspider_spark.functions.urlpure import URL_FIELDS, parse_url

URL_STRUCT = StructType(
    [
        StructField("valid", BooleanType()),
        StructField("url", StringType()),
        StructField("scheme", StringType()),
        StructField("netloc", StringType()),
        StructField("hostname", StringType()),
        StructField("domain", StringType()),
        StructField("path", StringType()),
        StructField("ext", StringType()),
        StructField("querystring", StringType()),
        StructField("pattern", StringType()),
        StructField("scan_key", StringType()),
        StructField("index_page", StringType()),
        StructField("blocked", BooleanType()),
        StructField("alicdn", BooleanType()),
        StructField("block_names", ArrayType(StringType())),
    ]
)


def _derive_batch(s: pd.Series) -> pd.DataFrame:
    """Parse each *unique* non-null URL once, then reindex over the
    batch. Null inputs yield all-null rows (Arrow validity bitmaps
    only) — the fused hybrid path depends on this: JVM-eligible rows
    are nulled before the UDF so the python round-trip carries no
    payload for them in either direction."""
    mask = s.notna()
    uniq = pd.Index(s[mask].unique())
    parsed = pd.DataFrame(
        [parse_url(u) for u in uniq], columns=URL_FIELDS, index=uniq
    )
    out = parsed.reindex(s.where(mask).values)
    out.reset_index(drop=True, inplace=True)
    if not mask.all():
        # true None (not NaN) so Arrow treats array/bool fields as
        # null — but only pay the object-dtype copy when the batch
        # actually contains nulls (the residue hot path usually doesn't)
        out = out.astype(object)
        out.loc[~mask.values, :] = None
    return out


@pandas_udf(URL_STRUCT)
def derive_url(s: pd.Series) -> pd.DataFrame:
    return _derive_batch(s)


# ---------------------------------------------------------------------------
# JVM fast path

# plain-http(s) shape where the JVM derivation is provably identical to
# the Python path: lowercase scheme; host limited to dot-separated
# [A-Za-z0-9-] labels (no empty labels / leading or trailing dots, no
# userinfo/IPv6/invalid ports); optional numeric port; path/query/
# fragment free of ';' (params), '%' (unquoting), '+' (parse_qsl space
# rules), backslashes and whitespace.
FAST_URL_RE = (
    r"^https?://[A-Za-z0-9\-]+(\.[A-Za-z0-9\-]+)*(:[0-9]+)?"
    r"(/[A-Za-z0-9._~/\-]*)?"
    r"(\?[A-Za-z0-9_.=&\-]*)?"
    r"(#[A-Za-z0-9_./\-]*)?$"
)

from tspider_spark.functions import psl as _psl
from tspider_spark.functions.urlpure import BLOCKEXT as _BLOCKEXT
from tspider_spark.functions.urlpure import BLOCKHOST as _BLOCKHOST


def fast_eligible(url_col) -> "F.Column":
    return url_col.isNotNull() & url_col.rlike(FAST_URL_RE)


def _jvm_url_fields(url_col, ml_col, hostname_col=None) -> dict:
    """Whole-stage-codegen derivation for fast-path URLs, one Column
    per field. Field-exact twin of urlpure.parse_url on the
    FAST_URL_RE domain. ``ml_col``: the PSL match length resolved by
    _with_psl_match_len (suffix label count of the public suffix).
    ``hostname_col``: the hostname already derived below the PSL join
    — passing it avoids re-running the netloc substring chain (the
    join boundary defeats codegen subexpression elimination)."""
    BIG = F.lit(1 << 30)
    u = url_col
    defrag = F.substring_index(u, "#", 1)
    scheme = F.substring_index(u, ":", 1)
    rest = F.substring(defrag, F.length(scheme) + 4, BIG)
    netloc = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    after_netloc = F.substring(rest, F.length(netloc) + 1, BIG)
    raw_path = F.substring_index(after_netloc, "?", 1)
    path = F.when(raw_path == "", "/").otherwise(raw_path)
    query = F.when(
        F.instr(after_netloc, "?") > 0,
        F.substring(after_netloc, F.instr(after_netloc, "?") + 1, BIG),
    ).otherwise("")
    hostname = (
        hostname_col
        if hostname_col is not None
        else F.lower(F.regexp_replace(netloc, ":[0-9]*$", ""))
    )
    filename = F.substring_index(path, "/", -1)
    ext = F.when(
        F.instr(filename, ".") > 0, F.substring_index(filename, ".", -1)
    ).otherwise("")

    # PSL registered domain over the FULL bundled list: match_len is
    # resolved BEFORE this projection by one broadcast join against the
    # grouped rule table (_with_psl_match_len below) and arrives here
    # as the precomputed ``ml_col`` — keeping this expression tree tiny
    # and the per-row cost a hash probe plus a label slice.
    parts = F.split(hostname, r"\.")
    n = F.size(parts)
    match_len = ml_col
    domain = F.when(
        n > match_len,
        F.concat_ws(".", F.slice(parts, n - match_len, match_len + 1)),
    ).otherwise(hostname)

    # pattern (T2): digits -> {digit} in path; sorted distinct query
    # keys with non-blank values, '<>'-joined
    path_pattern = F.regexp_replace(path, "[0-9]+", "{digit}")
    qkeys = F.array_sort(
        F.array_distinct(
            F.transform(
                F.filter(
                    F.split(query, "&"),
                    lambda kv: (F.instr(kv, "=") > 0)
                    & (F.substring(kv, F.instr(kv, "=") + 1, F.lit(1 << 30)) != ""),
                ),
                lambda kv: F.substring_index(kv, "=", 1),
            )
        )
    )
    pqs = F.when(
        F.size(qkeys) > 0,
        F.concat(path_pattern, F.lit("?"), F.array_join(qkeys, "<>")),
    ).otherwise(path_pattern)
    pattern = F.concat(scheme, F.lit("://"), netloc, pqs)
    scan_key = F.concat(netloc, F.lit("/"), pqs)
    index_page = F.concat(scheme, F.lit("://"), netloc, F.lit("/"))

    blocked = F.lower(ext).isin(*sorted(_BLOCKEXT)) | hostname.isin(
        *sorted(_BLOCKHOST)
    )
    alicdn = path.endswith("/") & query.startswith("?")

    # F10 suffix walk: [domain] + every hostname suffix down to
    # <x>.domain, longest first (urlpure.block_names order)
    d_labels = F.size(F.split(domain, r"\."))
    n_prefix = n - d_labels
    walk = F.transform(
        F.sequence(F.lit(1), n_prefix),
        lambda i: F.concat_ws(".", F.slice(parts, i, n - i + 1)),
    )
    block_names = F.when(n_prefix > 0, F.concat(F.array(domain), walk)).otherwise(
        F.array(domain)
    )

    return {
        # null-propagating (NOT lit(True)): in the hybrid coalesce a
        # null URL must fall through to a null struct, same as the UDF
        "valid": F.when(u.isNotNull(), F.lit(True)),
        "url": u,
        "scheme": scheme,
        "netloc": netloc,
        "hostname": hostname,
        "domain": domain,
        "path": path,
        "ext": ext,
        "querystring": query,
        "pattern": pattern,
        "scan_key": scan_key,
        "index_page": index_page,
        "blocked": blocked,
        "alicdn": alicdn,
        "block_names": block_names,
    }


def _jvm_url_struct(url_col, ml_col, hostname_col=None) -> "F.Column":
    return F.struct(
        *[
            c.alias(n)
            for n, c in _jvm_url_fields(url_col, ml_col, hostname_col).items()
        ]
    )


# ---------------------------------------------------------------------------
# PSL match-length resolution (broadcast join, zero Python)

_PSL_RULES_SCHEMA = (
    "_psl_key string, _psl_m2 boolean, "
    "_psl_rules array<struct<lvl:int, wild:boolean, exc:boolean, s:string>>"
)
_psl_rules_cache: dict = {}


def _psl_rules_df(spark):
    """The grouped PSL rule table (~4.7k rows), cached per session.
    Broadcast at each use — a dimension table in the classic sense."""
    key = id(spark)
    if key not in _psl_rules_cache or _psl_rules_cache[key][0] is not spark:
        df = spark.createDataFrame(_psl.jvm_rule_rows(), _PSL_RULES_SCHEMA)
        _psl_rules_cache.clear()  # one live session at a time
        _psl_rules_cache[key] = (spark, df)
    return _psl_rules_cache[key][1]


def _hostname_of(url_col) -> "F.Column":
    netloc = F.substring_index(
        F.substring_index(
            F.substring(
                F.substring_index(url_col, "#", 1),
                F.length(F.substring_index(url_col, ":", 1)) + 4,
                F.lit(1 << 30),
            ),
            "/",
            1,
        ),
        "?",
        1,
    )
    return F.lower(F.regexp_replace(netloc, ":[0-9]*$", ""))


def _with_psl_match_len(df, url_col, out: str):
    """Attach the PSL match length for ``url_col``'s hostname as
    column ``out``: one broadcast left join on the hostname's last two
    labels, then a spec-exact resolution over the (tiny, usually
    empty) per-group rule array — exception prevails, else longest
    match, else the 1-label default; single-label wildcard bases
    (*.ck, ...) are a 15-literal IN check."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    # derive the hostname ONCE, below the join, and materialize it as a
    # column: every later reference (join key, rule resolution, and the
    # caller's struct projection via ``_psl_h``) is then an attribute
    # read — the join boundary otherwise defeats codegen subexpression
    # elimination and the netloc substring chain runs 3x per row
    df = df.withColumn("_psl_h", _hostname_of(c))
    hostname = F.col("_psl_h")
    parts = F.split(hostname, r"\.")
    n = F.size(parts)
    key = F.when(
        n >= 2, F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    ).otherwise(hostname)
    rules = _psl_rules_df(df.sparkSession)
    df = df.withColumn("_psl_k", key).join(
        F.broadcast(rules), F.col("_psl_k") == F.col("_psl_key"), "left"
    )
    # sufs[k] = the hostname's last k labels (null when n < k)
    sufs = F.array(
        *[
            F.when(n >= k, F.concat_ws(".", F.slice(parts, n - k + 1, k)))
            for k in range(1, 6)
        ]
    )

    def hit(r):  # non-exception rule match at level r.lvl
        return F.when(
            r["wild"],
            (n >= r["lvl"]) & (F.element_at(sufs, r["lvl"] - 1) == r["s"]),
        ).otherwise(F.element_at(sufs, r["lvl"]) == r["s"])

    matched_max = F.array_max(
        F.transform(
            F.filter(F.col("_psl_rules"), lambda r: ~r["exc"] & hit(r)),
            lambda r: r["lvl"],
        )
    )
    exc_lvl = F.array_max(
        F.transform(
            F.filter(
                F.col("_psl_rules"),
                lambda r: r["exc"] & (F.element_at(sufs, r["lvl"]) == r["s"]),
            ),
            lambda r: r["lvl"],
        )
    )
    w1 = F.when(
        (n >= 2) & F.element_at(parts, -1).isin(*_psl.WILD1_BASES), 2
    ).otherwise(1)
    best = F.greatest(
        F.coalesce(matched_max, F.lit(1)),
        F.when(F.col("_psl_m2") == True, 2).otherwise(1),  # noqa: E712
        w1,
    )
    # join miss (the common case: hosts under plain TLDs with no
    # multi-label rules) short-circuits past the suffix-array work —
    # only the 1-label wildcard check runs
    ml = F.when(
        F.col("_psl_key").isNull(), w1
    ).otherwise(F.when(exc_lvl.isNotNull(), exc_lvl - 1).otherwise(best))
    # _psl_h is kept: with_url_info feeds it to the struct projection
    return df.withColumn(out, ml).drop("_psl_k", "_psl_key", "_psl_m2", "_psl_rules")


def with_url_info(
    df,
    url_col: str = "url",
    out: str = "u",
    hybrid: bool = True,
    eligible_col: str | None = None,
):
    """Attach the derived-URL struct column ``out`` to ``df``.

    hybrid=True routes plain-http(s) rows through the JVM expressions
    (no Python at all) and only the residue through the pandas UDF --
    the single biggest throughput lever in the scheduling pipeline.

    Two filtered branches unioned -- deliberately, after measuring the
    "cleverer" one-pass alternatives: (a) a struct-level CASE defeats
    SimplifyExtractValueOps, so every downstream field access
    re-evaluates the whole 15-field expression (~6x CPU); (b) per-field
    CASE/COALESCE routing makes every JVM sub-expression conditional,
    which disables codegen's common-subexpression elimination across
    the fields (~4x CPU); (c) feeding all rows through ArrowEvalPython
    with null-masked input pays a JVM-side row-queue for the whole
    stream (~2x CPU). The union keeps each branch's struct a plain
    CreateNamedStruct -- field accesses simplify, subexpressions share
    -- at the cost of two scans of the input, which callers mitigate by
    caching the (narrow) candidate stream.
    """
    c = F.col(url_col)
    if not hybrid:
        return df.withColumn(out, derive_url(c))
    # eligible_col: caller-precomputed fast_eligible flag (stored in
    # their cache/checkpoint), so the branch filters read a boolean
    # instead of each re-running the regex over the full input. The
    # column is consumed (dropped from the output).
    elig = fast_eligible(c) if eligible_col is None else F.col(eligible_col)
    drop = [eligible_col] if eligible_col else []
    fast = _with_psl_match_len(df.filter(elig), c, "_psl_ml")
    fast = fast.withColumn(
        out, _jvm_url_struct(c, F.col("_psl_ml"), F.col("_psl_h"))
    ).drop("_psl_ml", "_psl_h", *drop)
    slow = df.filter(~elig | c.isNull()).withColumn(out, derive_url(c)).drop(*drop)
    return fast.unionByName(slow)


# ---------------------------------------------------------------------------
# tracking-parameter stripping (canonicalization extension; the
# reference has no analog — its T2 pattern key absorbs tracking params
# into the dedupe key, but the SCHEDULED url still carries them, so
# utm-decorated links burn budget on pages the crawl already has)

TRACKING_PARAM_KEYS = (
    "fbclid", "gclid", "gclsrc", "icid", "igshid", "mc_cid", "mc_eid",
    "mkt_tok", "msclkid", "ref", "ref_src", "yclid", "_hsenc", "_hsmi",
)


def strip_tracking_params(
    url_col, extra_keys: tuple = (), drop_fragment: bool = True
):
    """Column expression removing ad/analytics tracking query params
    (any ``utm_*`` key plus :data:`TRACKING_PARAM_KEYS`, matched
    case-insensitively on the key only) while PRESERVING the order of
    the surviving params — canonicalization, not normalization: two
    URLs that differ only in tracking decoration collapse to one
    frontier task *before* the seen-set, saving the fetch itself.

    Pure JVM (split + higher-order filter + concat), shuffle-free.
    Fragments are dropped by default — the same choice the reference's
    JS normalizer makes (core.js:125-131 strips ``#fragment``)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    u0 = F.substring_index(c, "#", 1) if drop_fragment else c
    base = F.substring_index(u0, "?", 1)
    qs = F.regexp_extract(u0, r"\?(.*)", 1)  # "" when no '?'
    keys = tuple(k.lower() for k in TRACKING_PARAM_KEYS + tuple(extra_keys))
    klit = F.array(*[F.lit(k) for k in keys])

    def keep(tok):
        k = F.lower(F.substring_index(tok, "=", 1))
        return ~(k.startswith("utm_") | F.array_contains(klit, k))

    kept = F.filter(F.split(qs, "&"), keep)
    return F.when(~u0.contains("?"), base).otherwise(
        F.when(
            F.size(kept) > 0,
            F.concat(base, F.lit("?"), F.array_join(kept, "&")),
        ).otherwise(base)
    )
