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
two-level ``_exclusive_stratum_cumsum`` engine shared with
``pack_shards`` — no global window there either.
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
    if prefix_len < 2 or prefix_len & (prefix_len - 1):
        raise ValueError("prefix_len must be a power of two >= 2")
    pos = corpus_positions(docs, id_col, text, max_doc_chars).localCheckpoint(
        eager=True
    )
    r = pos.select("gpos", F.col("code").cast("long").alias("rank"))
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
    sa = distributed_rank(r, ("rank", "gpos"), out="sa_rank")
    return (
        sa.filter(F.col("sa_rank") <= top_k)
        .join(pos.select("gpos", id_col, "off"), "gpos")
        .select(
            F.col("sa_rank").cast("long").alias("sa_rank"),
            "gpos",
            F.col(id_col),
            "off",
        )
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
    ``docs(doc_id, text)``."""
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
 )
 select cast(row_number() over (
          order by substring(b.g, cast(p.gpos + 1 as int), {prefix_len}),
                   p.gpos) as bigint) as sa_rank,
        p.gpos, p.doc_id, p.off
 from pos p, big b
 qualify sa_rank <= {top_k}
"""
