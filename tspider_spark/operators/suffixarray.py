"""Distributed suffix-array construction by prefix doubling
(Manber-Myers / the Larsson-Sadakane doubling step, expressed as
joins) over the concatenated corpus string — the index structure
underneath suffix-array ExactSubstr deduplication (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better"). The
repo's ``quality.substring_dedupe`` implements the *fixed-window*
form of ExactSubstr; this operator builds the *general* index that
form approximates, as a first-class scale path: every step below is
a bounded hash exchange, never a driver-side sort.

Corpus model: documents are ASCII-cleaned, hard-capped per doc, and
concatenated in doc-id order with a ``\\x01`` sentinel after each doc
(codepoint 1, below every printable character), exactly the
ExactSubstr corpus layout. Suffixes therefore RUN ACROSS document
boundaries through sentinels — matching the concatenated-corpus
semantics the paper's suffix automaton sees, and what the DuckDB
oracle replays with one ``string_agg`` + ``substring`` sort.

Semantics are the bounded-context suffix array: suffixes are ordered
by their first ``prefix_len`` characters (missing past-corpus-end
positions rank below every character), ties broken by global
position. ``prefix_len`` caps the doubling at ``log2(prefix_len)``
rounds REGARDLESS of corpus size — the standard trade for training
corpora where duplicate runs beyond a few hundred bytes are already
caught by the first bytes, and what keeps every round's join key
width constant at 10^10 positions.

Scale shape per doubling round (k -> 2k): ONE self-equi-join on the
shifted global position (hash exchange on ``gpos``; both sides are
the same materialized rank table) + ONE distinct over rank pairs +
the three-level ``distributed_rank`` (no single-partition window
anywhere — schedule.py:204). Lineage is cut per round with eager
``localCheckpoint`` (the rank table is self-referencing, the
PageRank 308s->10s lesson). Doc base offsets come from the
three-level ``_exclusive_stratum_cumsum`` engine shared with
``pack_shards`` — range-partition buckets + super-bucket window +
triangular-join offsets, so no single-partition window exists there
even under this module's constant stratum (pinned by
``tests/test_plan_pins.py::test_suffix_array_has_no_empty_partition_window``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curate import _exclusive_stratum_cumsum
from .schedule import distributed_rank


def corpus_positions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    max_doc_chars: int = 120,
) -> DataFrame:
    """ASCII-clean + cap each document, concatenate in id order with a
    ``\\x01`` sentinel per doc, and emit one row per character
    position: (gpos long, code int, doc_id, off int).

    Cleaning keeps ``[A-Za-z0-9 ]`` then ASCII-lowercases — replace
    BEFORE lower, so only ASCII ever reaches lower() and the Unicode
    lowercasing quirks (dotted-I etc.) that differ between engines
    can't leak into the alphabet. ``code`` is the codepoint (sentinel
    = 1 < every kept character).
    """
    cleaned = docs.select(
        F.col(id_col),
        F.concat(
            F.substring(
                F.lower(
                    F.regexp_replace(F.col(text), "[^A-Za-z0-9 ]+", "")
                ),
                1,
                max_doc_chars,
            ),
            F.lit("\x01"),
        ).alias("_s"),
    )
    lens = cleaned.select(
        F.col(id_col), F.lit(0).alias("_one"), F.length("_s").alias("_len")
    )
    base = _exclusive_stratum_cumsum(
        lens, "_one", id_col, "_len", super_shift=20
    ).select(F.col(id_col), F.col("_cum").alias("_base"))
    chars = cleaned.join(base, id_col).select(
        F.col(id_col),
        F.col("_base"),
        F.posexplode(F.split(F.col("_s"), "")).alias("_p", "_ch"),
    )
    # split on '' leaves a trailing empty element in some Spark
    # versions — drop any empty cell defensively
    chars = chars.filter(F.col("_ch") != "")
    return chars.select(
        F.col(id_col),
        (F.col("_base") + F.col("_p")).cast("long").alias("gpos"),
        F.ascii("_ch").cast("int").alias("code"),
        F.col("_p").cast("int").alias("off"),
    )


def _doubling_tables(
    pos: DataFrame, prefix_len: int
) -> dict[int, DataFrame]:
    """Prefix-doubling rank tables: ``{k: (gpos, rank)}`` where
    ``rank`` orders suffixes by their first ``k`` characters, for
    every power of two k <= ``prefix_len``. Each round is ONE
    self-equi-join on the shifted gpos + one distinct-pair rank
    (:func:`distributed_rank` — never a single-partition window),
    lineage cut with eager ``localCheckpoint``. The intermediate
    tables are kept because :func:`longest_repeats` reuses them for
    O(log prefix_len) binary-lifting LCP probes."""
    if prefix_len < 2 or prefix_len & (prefix_len - 1):
        raise ValueError("prefix_len must be a power of two >= 2")
    r = pos.select("gpos", F.col("code").cast("long").alias("rank"))
    tables = {1: r}
    k = 1
    while k < prefix_len:
        shifted = r.select(
            (F.col("gpos") - k).alias("gpos"), F.col("rank").alias("_r2")
        )
        paired = (
            r.join(shifted, "gpos", "left")
            .select(
                "gpos",
                F.col("rank").alias("_r1"),
                F.coalesce(F.col("_r2"), F.lit(-1)).alias("_r2"),
            )
        )
        # ranks need only be order-isomorphic integers, not dense:
        # rank the DISTINCT pairs (no ties -> exact) and join back, so
        # equal pairs share a rank and the doubling invariant holds
        ranked = distributed_rank(
            paired.select("_r1", "_r2").distinct(),
            ("_r1", "_r2"),
            out="_nr",
        )
        r = (
            paired.join(ranked, ["_r1", "_r2"])
            .select("gpos", F.col("_nr").cast("long").alias("rank"))
            .localCheckpoint(eager=True)
        )
        k *= 2
        tables[k] = r
    return tables


def suffix_array_ranks(
    pos: DataFrame, prefix_len: int = 64
) -> DataFrame:
    """Full suffix ranking of a materialized position table (from
    :func:`corpus_positions`): returns (gpos, sa_rank) for EVERY
    position — the prefix-doubling core shared by :func:`suffix_array`
    (which keeps the head) and :func:`longest_repeats` (which walks
    adjacent ranks)."""
    r = _doubling_tables(pos, prefix_len)[prefix_len]
    sa = distributed_rank(r, ("rank", "gpos"), out="sa_rank")
    return sa.select("gpos", F.col("sa_rank").cast("long").alias("sa_rank"))


def suffix_array(
    docs: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    max_doc_chars: int = 120,
    prefix_len: int = 64,
    top_k: int = 300,
) -> DataFrame:
    """Bounded-context suffix array of the concatenated corpus (see
    module docstring). Returns the first ``top_k`` suffixes in
    lexicographic order: (sa_rank long, gpos long, doc_id, off int).
    """
    pos = corpus_positions(docs, id_col, text, max_doc_chars).localCheckpoint(
        eager=True
    )
    sa = suffix_array_ranks(pos, prefix_len)
    return (
        sa.filter(F.col("sa_rank") <= top_k)
        .join(pos.select("gpos", id_col, "off"), "gpos")
        .select("sa_rank", "gpos", F.col(id_col), "off")
    )


def longest_repeats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    max_doc_chars: int = 120,
    prefix_len: int = 64,
    min_len: int = 8,
    top_k: int = 100,
) -> DataFrame:
    """Longest repeated substrings via adjacent-rank LCP — the suffix
    array doing ExactSubstr's actual job (Lee et al. 2022 §3: every
    repeated substring is a common prefix of two lexicographically
    ADJACENT suffixes, so scanning adjacent pairs finds all maximal
    repeats).

    LCP per adjacent pair is BINARY LIFTING over the prefix-doubling
    rank tables :func:`_doubling_tables` already materializes (the
    classic sparse-table LCP): rank_k(a) == rank_k(b) iff the first k
    characters agree, so descend k = prefix_len/2, ..., 1 advancing a
    cursor — O(log prefix_len) probe rounds of two hash joins each
    over the N adjacent pairs, instead of the 64xN-row character
    explode this replaced (the r3 verdict's finding #3: at 10^12
    characters the explode dominated the whole job). Repeats STOP AT
    SENTINELS (a "repeat" crossing a document boundary is an
    artifact): the rank-derived LCP is capped by each side's distance
    to its document's ``\\x01`` — equivalent to the old charwise
    sentinel-mismatch rule because sentinels only ever rank-match
    sentinels at the same relative offset.

    Returns pairs with LCP >= ``min_len``, longest first (total order
    lcp desc, gpos_a asc), capped at ``top_k``:
    (lcp int, doc_a, off_a int, doc_b, off_b int).
    """
    pos = corpus_positions(docs, id_col, text, max_doc_chars).localCheckpoint(
        eager=True
    )
    tables = _doubling_tables(pos, prefix_len)
    sa = distributed_rank(
        tables[prefix_len], ("rank", "gpos"), out="sa_rank"
    ).localCheckpoint(eager=True)
    a = sa.select(
        F.col("sa_rank").alias("_r"),
        F.col("gpos").alias("_ga"),
        F.col("rank").alias("_rka"),
    )
    b = sa.select(
        (F.col("sa_rank") - 1).alias("_r"),
        F.col("gpos").alias("_gb"),
        F.col("rank").alias("_rkb"),
    )
    # full-table ranks equal => first prefix_len chars agree (the cap)
    adj = a.join(b, "_r").select(
        "_ga",
        "_gb",
        F.when(F.col("_rka") == F.col("_rkb"), F.lit(prefix_len))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("lcp"),
    )
    k = prefix_len // 2
    while k >= 1:
        rk = tables[k]
        ra = rk.select(F.col("gpos").alias("_pa"), F.col("rank").alias("_ra"))
        rb = rk.select(F.col("gpos").alias("_pb"), F.col("rank").alias("_rb"))
        adj = (
            adj.join(ra, adj["_ga"] + adj["lcp"] == ra["_pa"], "left")
            .join(rb, adj["_gb"] + adj["lcp"] == rb["_pb"], "left")
            .select(
                "_ga",
                "_gb",
                # null-guarded: a missing (past-corpus-end) position
                # never matches. Pairs that started at prefix_len
                # (full-rank equal) DO keep matching here when the
                # repeat extends past prefix_len chars — they descend
                # to up to 2*prefix_len-1; the bounded-context cap is
                # re-applied in the final least() (sf0.1 caught this:
                # >64-char repeats exist there but not at sf0.01).
                F.when(
                    F.col("_ra").isNotNull()
                    & (F.col("_ra") == F.col("_rb")),
                    F.col("lcp") + F.lit(k),
                )
                .otherwise(F.col("lcp"))
                .cast("int")
                .alias("lcp"),
            )
        )
        # no per-round checkpoint: the probe tables are already
        # materialized, so adj's lineage is a fixed log2(prefix_len)-
        # deep join chain — bounded, not self-referencing
        k //= 2
    # sentinel cap: distance from gpos to its doc's trailing \x01
    # (= max off within the doc minus own off)
    doc_end = pos.groupBy(id_col).agg(F.max("off").alias("_mx"))
    info = pos.join(doc_end, id_col).select(
        "gpos",
        F.col(id_col),
        F.col("off"),
        (F.col("_mx") - F.col("off")).cast("int").alias("_sd"),
    )
    out = (
        adj.join(info.withColumnRenamed("gpos", "_ga"), "_ga")
        .withColumnsRenamed({id_col: "doc_a", "off": "off_a", "_sd": "_sda"})
        .join(info.withColumnRenamed("gpos", "_gb"), "_gb")
        .withColumnsRenamed({id_col: "doc_b", "off": "off_b", "_sd": "_sdb"})
        .select(
            # bounded-context cap (prefix_len) + sentinel caps: both
            # are part of the LCP definition, not post-hoc trims
            F.least("lcp", F.lit(prefix_len), "_sda", "_sdb")
            .cast("int")
            .alias("lcp"),
            "doc_a",
            "off_a",
            "doc_b",
            "off_b",
            "_ga",
        )
    )
    return (
        out.filter(F.col("lcp") >= min_len)
        .orderBy(F.col("lcp").desc(), F.col("_ga").asc())
        .limit(top_k)
        .select("lcp", "doc_a", "off_a", "doc_b", "off_b")
    )


def suffix_array_oracle_sql(
    docs_cte: str,
    max_doc_chars: int = 120,
    prefix_len: int = 64,
    top_k: int = 300,
) -> str:
    """DuckDB twin of :func:`suffix_array`: same cleaning, one
    ``string_agg`` concatenation in id order, per-position
    ``substring`` of the global string capped at ``prefix_len``,
    sorted with position tie-break. ``docs_cte`` must define
    ``docs(doc_id, text)``.

    The sort key is the CODEPOINT ARRAY of the capped prefix, not the
    raw varchar: integer-list comparison is collation-free, so no
    DuckDB build/locale can reorder the suffixes relative to Spark's
    integer-code doubling ranks (r3's one red driver row was exactly
    such an environment-collation divergence; shorter-prefix-first
    list semantics match the "missing positions rank below every
    character" rule since all codes are >= 1)."""
    return f"""{docs_cte}
 , cleaned as (
   select doc_id,
     substring(lower(regexp_replace(text, '[^A-Za-z0-9 ]+', '', 'g')),
               1, {max_doc_chars}) || chr(1) as s
   from docs
 ),
 base as (
   select doc_id, s,
     coalesce(sum(length(s)) over (order by doc_id
       rows between unbounded preceding and 1 preceding), 0) as base
   from cleaned
 ),
 big as (select string_agg(s, '' order by doc_id) as g from cleaned),
 pos as (
   select d.doc_id, cast(d.base + i - 1 as bigint) as gpos,
          cast(i - 1 as int) as off
   from base d, unnest(range(1, length(d.s) + 1)) as t(i)
 )
 select cast(row_number() over (
          order by list_transform(
                     string_split(
                       substring(b.g, cast(p.gpos + 1 as int),
                                 {prefix_len}), ''),
                     x -> ascii(x)),
                   p.gpos) as bigint) as sa_rank,
        p.gpos, p.doc_id, p.off
 from pos p, big b
 qualify sa_rank <= {top_k}
"""

def longest_repeats_oracle_sql(
    docs_cte: str,
    max_doc_chars: int = 120,
    prefix_len: int = 64,
    min_len: int = 8,
    top_k: int = 100,
) -> str:
    """DuckDB twin of :func:`longest_repeats`: sort the capped
    suffixes, pair each with its successor, and compute the LCP as
    the longest equal prefix containing no sentinel. ``docs_cte``
    must define ``docs(doc_id, text)``."""
    return f"""{docs_cte}
 , cleaned as (
   select doc_id,
     substring(lower(regexp_replace(text, '[^A-Za-z0-9 ]+', '', 'g')),
               1, {max_doc_chars}) || chr(1) as s
   from docs
 ),
 base as (
   select doc_id, s,
     coalesce(sum(length(s)) over (order by doc_id
       rows between unbounded preceding and 1 preceding), 0) as base
   from cleaned
 ),
 big as (select string_agg(s, '' order by doc_id) as g from cleaned),
 pos as (
   select d.doc_id, d.base + i - 1 as gpos, cast(i - 1 as int) as off
   from base d, unnest(range(1, length(d.s) + 1)) as t(i)
 ),
 ordered as (
   select p.doc_id, p.gpos, p.off,
          substring(b.g, cast(p.gpos + 1 as int), {prefix_len}) as s,
          row_number() over (
            order by list_transform(
                       string_split(
                         substring(b.g, cast(p.gpos + 1 as int),
                                   {prefix_len}), ''),
                       x -> ascii(x)),
                     p.gpos) as r
   from pos p, big b
 ),
 adj as (
   select x.gpos as ga, x.s as sa, y.s as sb,
          x.doc_id as doc_a, x.off as off_a,
          y.doc_id as doc_b, y.off as off_b
   from ordered x join ordered y on y.r = x.r + 1
 ),
 lcps as (
   select ga, doc_a, off_a, doc_b, off_b,
     cast(coalesce((
        select max(l) from unnest(range(1, {prefix_len} + 1)) as t(l)
        where substring(sa, 1, cast(l as int))
                = substring(sb, 1, cast(l as int))
          and strpos(substring(sa, 1, cast(l as int)), chr(1)) = 0
     ), 0) as int) as lcp
   from adj
 )
 select lcp, doc_a, off_a, doc_b, off_b
 from lcps
 where lcp >= {min_len}
 order by lcp desc, ga asc
 limit {top_k}
"""
