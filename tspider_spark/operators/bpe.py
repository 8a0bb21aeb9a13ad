"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The inner loop every LLM-tokenizer build runs over its training
corpus: count adjacent symbol pairs, merge the most frequent pair
everywhere, repeat. At 100 TB the standard distributed shape — and the
one implemented here — is:

- **ONE corpus scan** builds the word-frequency table (word → count),
  a hash aggregation with map-side combine. Everything after operates
  on that table, which is *vocabulary*-sized (≤ ~10^8 rows however
  large the corpus), not corpus-sized.
- **Each merge round is one shuffle over the vocab table**: explode
  adjacent symbol pairs (weighted by word freq), aggregate, take the
  argmax. The winning pair — ONE row of metadata per round — is
  collected to the driver and folded back in as a literal, so the
  merge step is a shuffle-free JVM string map and the lineage grows
  linearly (each round references the previous word table once).
- All counts are integer sums and the argmax tie-break is total
  (count desc, lhs asc, rhs asc), so training is bit-reproducible
  across engines and cluster sizes — pinned by a DuckDB oracle twin
  that replays every round as a chained CTE.

Merge semantics are canonical greedy left-to-right non-overlapping
(Sennrich's ``re.sub`` with non-consuming lookarounds): in ``a a a a``
the pair (a,a) merges at positions (0,1) and (2,3). Lookarounds don't
exist in DuckDB's RE2, so both engines use a literal-``replace`` trick
that reproduces them exactly: symbols are temporarily joined by DOUBLE
spaces and the pattern ``' l  r '`` → ``' lr '`` consumes one space
from each side, leaving the other for the neighbouring occurrence —
consecutive occurrences (``l r l r``) and odd runs (``a a a``) merge
exactly as the canonical regex does.

Pair counting is canonical too: ALL adjacent positions count, so
``[a,a,a]`` contributes (a,a) twice (Sennrich ``get_stats``).

Words are lowercase ``[a-z]+`` runs (the engines' common regex
dialect); no end-of-word marker is appended — a documented divergence
from word-final BPE variants, irrelevant to the distributed shape.

Reference parity: the reference has no tokenizer (crawlers don't);
this is part of the training-data-pipeline surface the graft adds on
top of the crawl engine (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WORD_RE = "[a-z]+"


def word_freq_table(docs: DataFrame, text: str = "text") -> DataFrame:
    """(sym, freq): one row per distinct word, symbols space-joined
    starting at characters. The single corpus-sized scan."""
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text}), '{WORD_RE}', 0)")
        ).alias("w")
    )
    return words.groupBy(
        # 'a b c' — initial symbol sequence is the character sequence
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym")
    ).agg(F.count(F.lit(1)).cast("long").alias("freq"))


def _pair_counts(wtab: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the symbol strings, weighted by word
    frequency: ONE explode + hash agg over the vocab-sized table."""
    pairs = F.expr(
        "zip_with(slice(split(sym, ' '), 1, size(split(sym, ' ')) - 1),"
        "         slice(split(sym, ' '), 2, size(split(sym, ' ')) - 1),"
        "         (l, r) -> struct(l as lhs, r as rhs))"
    )
    return (
        wtab.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").cast("long").alias("n"))
    )


def _merge_expr(lhs: str, rhs: str) -> F.Column:
    """Canonical greedy merge of (lhs, rhs) as a literal-replace chain
    (see module docstring for why not regex lookarounds)."""
    return F.trim(
        F.regexp_replace(
            F.expr(
                "replace(concat('  ', replace(sym, ' ', '  '), '  '), "
                f"concat(' ', {lhs!r}, '  ', {rhs!r}, ' '), "
                f"concat(' ', {lhs!r}, {rhs!r}, ' '))"
            ),
            "  ",
            " ",
        )
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text: str = "text",
    checkpoint_every: int = 4,
) -> tuple[list[dict], DataFrame]:
    """Run ``n_merges`` BPE rounds. Returns ``(merges, word_table)``:
    ``merges`` is the learned merge list (round, lhs, rhs, merged, n —
    one row of driver-side metadata per round, the tokenizer itself),
    ``word_table`` the final (sym, freq) segmentation.

    Stops early (returning fewer merges) if no pair remains.
    """
    if n_merges < 1:
        raise ValueError("bpe_train needs n_merges >= 1")
    wtab = word_freq_table(docs, text)
    merges: list[dict] = []
    for k in range(n_merges):
        best = (
            _pair_counts(wtab)
            .orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, n = best[0]["lhs"], best[0]["rhs"], best[0]["n"]
        merges.append(
            {
                "round": k,
                "lhs": lhs,
                "rhs": rhs,
                "merged": lhs + rhs,
                "n": int(n),
            }
        )
        wtab = wtab.select(_merge_expr(lhs, rhs).alias("sym"), "freq")
        if (k + 1) % checkpoint_every == 0 and k + 1 < n_merges:
            # linear lineage (literal merges — each round references
            # the previous table once), cut anyway to keep driver-side
            # plan analysis flat over long trainings
            wtab = wtab.localCheckpoint(eager=True)
    return merges, wtab


def merges_df(spark, merges: list[dict]) -> DataFrame:
    """The learned merge table as a DataFrame (n_merges rows)."""
    return spark.createDataFrame(
        [(m["round"], m["lhs"], m["rhs"], m["merged"], m["n"]) for m in merges],
        "round int, lhs string, rhs string, merged string, n long",
    )


def bpe_vocab(word_table: DataFrame, top_k: int = 40) -> DataFrame:
    """Corpus-weighted symbol counts of a (trained) word table: the
    head of the learned vocabulary. (symbol, n_tokens), top_k by count
    with a total tie-break; TakeOrderedAndProject, no global sort."""
    return (
        word_table.select(
            F.explode(F.split("sym", " ")).alias("symbol"), "freq"
        )
        .groupBy("symbol")
        .agg(F.sum("freq").cast("long").alias("n_tokens"))
        .orderBy(F.desc("n_tokens"), F.asc("symbol"))
        .limit(int(top_k))
    )


def _round_ctes(k: int) -> str:
    """Oracle CTEs replaying round k: pair counts over w{k}, argmax
    b{k}, merged table w{k+1}. MATERIALIZED where referenced twice
    (DuckDB inlines plain CTEs at every reference — the same blowup
    the PageRank oracle measured)."""
    return f"""
 s{k} as (select string_split(sym, ' ') as arr, freq from w{k}),
 p{k} as (select arr[i] as lhs, arr[i + 1] as rhs, sum(freq)::bigint as n
          from (select arr, freq, unnest(range(1, len(arr))) as i from s{k})
          group by 1, 2),
 b{k} as materialized (
   select {k} as round, lhs, rhs, lhs || rhs as merged, n
   from p{k} order by n desc, lhs, rhs limit 1),
 w{k + 1} as materialized (
   select trim(replace(replace('  ' || replace(sym, ' ', '  ') || '  ',
           ' ' || b.lhs || '  ' || b.rhs || ' ',
           ' ' || b.lhs || b.rhs || ' '),
           '  ', ' ')) as sym, freq
   from w{k}, b{k} b)"""


def bpe_oracle_sql(
    docs_cte: str,
    n_merges: int = 8,
    output: str = "merges",
    top_k: int = 40,
) -> str:
    """DuckDB twin of :func:`bpe_train`: every round unrolled as a
    chained CTE (no recursion), byte-identical word regex / merge
    replace / tie-break. ``docs_cte`` must define ``docs(text)``.
    ``output``: 'merges' → the merge table, 'vocab' → the trained
    vocabulary head (same shape as :func:`bpe_vocab`)."""
    parts = [
        docs_cte,
        r"""w0 as materialized (
   select trim(regexp_replace(w, '(.)', '\1 ', 'g')) as sym,
          count(*)::bigint as freq
   from (select unnest(regexp_extract_all(lower(text), '[a-z]+')) as w
         from docs)
   group by 1)""",
    ]
    parts += [_round_ctes(k) for k in range(n_merges)]
    if output == "merges":
        final = " union all ".join(
            f"select round, lhs, rhs, merged, n from b{k}"
            for k in range(n_merges)
        )
    elif output == "vocab":
        final = f"""
 select symbol, sum(freq)::bigint as n_tokens
 from (select unnest(string_split(sym, ' ')) as symbol, freq
       from w{n_merges})
 group by 1 order by n_tokens desc, symbol limit {int(top_k)}"""
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown output {output!r}")
    return "with " + ",\n".join(parts) + "\n" + final


def bpe_encode(
    docs: DataFrame,
    word_table: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained segmentation to the corpus: per-document word
    and subword-token counts plus fertility (tokens/word) — the
    standard tokenizer-efficiency signal curation gates on.

    The trained word table IS the encode dictionary (word → its final
    symbol split), so encoding is: distinct (doc, word) counts — one
    corpus scan with map-side combine — joined to the vocab-sized
    dictionary on the bare word, then one per-doc rollup. No merge
    replay, no Python; the join's build side is vocabulary-sized and
    AQE picks broadcast vs shuffle by its actual size.

    Returns (id_col, n_words, n_tokens, fertility[6dp]); documents
    whose every word fell outside ``WORD_RE`` keep n_words = 0 rows
    out (no token mass to report).
    """
    dic = word_table.select(
        F.regexp_replace("sym", " ", "").alias("w"),
        F.size(F.split("sym", " ")).cast("long").alias("n_sym"),
    )
    wc = (
        docs.select(
            id_col,
            F.explode(
                F.expr(f"regexp_extract_all(lower({text}), '{WORD_RE}', 0)")
            ).alias("w"),
        )
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        wc.join(dic, "w")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_sym")).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "fertility",
            F.round(F.col("n_tokens") / F.col("n_words"), 6),
        )
    )


def bpe_encode_oracle_sql(docs_cte: str, n_merges: int = 8) -> str:
    """DuckDB twin of :func:`bpe_encode` over a :func:`bpe_oracle_sql`
    training replay. ``docs_cte`` must define ``docs(doc_id, text)``."""
    parts = [
        docs_cte,
        r"""w0 as materialized (
   select trim(regexp_replace(w, '(.)', '\1 ', 'g')) as sym,
          count(*)::bigint as freq
   from (select unnest(regexp_extract_all(lower(text), '[a-z]+')) as w
         from docs)
   group by 1)""",
    ]
    parts += [_round_ctes(k) for k in range(n_merges)]
    parts += [
        f"""
 dic as (select replace(sym, ' ', '') as w,
                len(string_split(sym, ' '))::bigint as n_sym
         from w{n_merges})""",
        """
 wc as (select doc_id, w, count(*)::bigint as cnt
        from (select doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) as w
              from docs)
        group by 1, 2)""",
    ]
    final = """
 select doc_id, sum(cnt)::bigint as n_words,
        sum(cnt * n_sym)::bigint as n_tokens,
        round(sum(cnt * n_sym) / (1.0 * sum(cnt)), 6) as fertility
 from wc join dic using (w)
 group by 1"""
    return "with " + ",\n".join(parts) + "\n" + final
