"""WordPiece (MaxMatch) tokenization — the second tokenizer family
next to ``bpe.py``'s merge-based BPE: BERT-style greedy
longest-match-first encoding against a fixed subword vocabulary
(Schuster & Nakajima 2012; Devlin et al. 2019 §WordPiece), with the
``##`` continuation convention and whole-word ``[UNK]`` on failure.

Where BPE *training* is the expensive distributed stage (bpe.py),
WordPiece's cost center is *encoding*, and the distributed shape here
is the same vocabulary-table trick ``bpe_encode`` uses: encoding
operates on the DISTINCT-WORD table (vocabulary-sized, ≤ ~10^8 rows
regardless of corpus size), never the corpus — the corpus-sized scan
happens exactly once to build word counts, and per-doc stats join the
encoded dictionary back by word.

The greedy loop runs at most ``MAX_WORD`` rounds (words longer than
that are ``[UNK]`` outright, BERT's ``max_input_chars_per_word``
cut): each round, every unfinished word explodes its ≤ ``MAX_PIECE``
candidate prefixes at the current position, hash-joins the BROADCAST
vocab (piece, at_start), and keeps the longest match — all JVM
expressions over a vocab-sized table, lineage cut every few rounds.
Single-character pieces are always in-vocab (at every position they
actually occur), so the loop cannot stall: progress is ≥ 1 char per
word per round.

The vocabulary itself is derived deterministically from the corpus —
start pieces are word prefixes, continuation pieces are interior
substrings, kept when they occur in ≥ ``min_df`` distinct words
(single chars always kept). Integer-and-string logic only, so the
DuckDB oracle replays the whole construction + every greedy round as
chained CTEs, bit-for-bit.

Reference parity: the reference has no tokenizer (crawlers don't);
this extends the training-data-pipeline surface (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .bpe import WORD_RE

MAX_WORD = 16
MAX_PIECE = 6


def corpus_words(docs: DataFrame, text: str = "text") -> DataFrame:
    """(w, cnt): distinct lowercase ``[a-z]+`` words with corpus
    occurrence counts — the one corpus-sized scan."""
    return (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text}), '{WORD_RE}', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def wordpiece_vocab(words: DataFrame, min_df: int = 3) -> DataFrame:
    """Derive the subword vocabulary from the distinct-word table:
    (piece, at_start). Start pieces = prefixes (length ≤ MAX_PIECE);
    continuation pieces = interior substrings; kept when they occur
    in ≥ ``min_df`` distinct words OR are single characters (so the
    encoder can always make progress). Only words ≤ MAX_WORD feed
    the vocab — longer words are [UNK] and contribute nothing."""
    enc = words.filter(F.length("w") <= MAX_WORD).select(
        "w", F.length("w").alias("len")
    )
    startp = (
        enc.select(
            "w",
            F.explode(
                F.expr(f"sequence(1, least({MAX_PIECE}, len))")
            ).alias("l"),
        )
        .select(F.expr("substring(w, 1, l)").alias("piece"), "w")
        .groupBy("piece")
        .agg(F.count_distinct("w").alias("df"))
        .select("piece", F.lit(True).alias("at_start"), "df")
    )
    contp = (
        enc.select(
            "w",
            "len",
            F.explode(F.expr("sequence(2, len)")).alias("p"),
        )
        .filter(F.col("len") >= 2)
        .select(
            "w",
            "p",
            F.explode(
                F.expr(f"sequence(1, least({MAX_PIECE}, len - p + 1))")
            ).alias("l"),
        )
        .select(F.expr("substring(w, p, l)").alias("piece"), "w")
        .groupBy("piece")
        .agg(F.count_distinct("w").alias("df"))
        .select("piece", F.lit(False).alias("at_start"), "df")
    )
    return (
        startp.unionByName(contp)
        .filter((F.col("df") >= min_df) | (F.length("piece") == 1))
        .select("piece", "at_start")
    )


def wordpiece_encode_words(
    words: DataFrame, vocab: DataFrame
) -> DataFrame:
    """Greedy longest-match-first encode of every distinct word:
    returns (w, cnt, n_pieces, pieces) with pieces space-joined and
    ``##``-marked continuations; words longer than MAX_WORD become
    '[UNK]'. See module docstring for the loop's scale shape."""
    base = words.select("w", "cnt", F.length("w").alias("len"))
    unk = base.filter(F.col("len") > MAX_WORD).select(
        "w",
        "cnt",
        F.lit(1).cast("long").alias("n_pieces"),
        F.lit("[UNK]").alias("pieces"),
    )
    state = base.filter(F.col("len") <= MAX_WORD).select(
        "w",
        "cnt",
        "len",
        F.lit(1).alias("pos"),
        F.lit("").alias("pieces"),
        (F.length("w") == 0).alias("done"),
    )
    for r in range(MAX_WORD):
        active = state.filter(~F.col("done"))
        cands = (
            active.select(
                "w",
                "pos",
                F.explode(
                    F.expr(f"sequence(1, least({MAX_PIECE}, len - pos + 1))")
                ).alias("l"),
            )
            .select(
                "w",
                F.expr("substring(w, pos, l)").alias("piece"),
                (F.col("pos") == 1).alias("at_start"),
                "l",
            )
        )
        best = (
            cands.join(F.broadcast(vocab), ["piece", "at_start"])
            .groupBy("w")
            .agg(F.max(F.struct("l", "piece")).alias("_m"))
            .select(
                "w", F.col("_m.l").alias("_l"), F.col("_m.piece").alias("_p")
            )
        )
        state = (
            state.join(best, "w", "left")
            .select(
                "w",
                "cnt",
                "len",
                F.when(F.col("done"), F.col("pos"))
                .otherwise(F.col("pos") + F.col("_l"))
                .alias("pos"),
                F.when(F.col("done"), F.col("pieces"))
                .when(F.col("pos") == 1, F.col("_p"))
                .otherwise(
                    F.concat(F.col("pieces"), F.lit(" ##"), F.col("_p"))
                )
                .alias("pieces"),
                (
                    F.col("done")
                    | (F.col("pos") + F.col("_l") > F.col("len"))
                )
                .alias("done"),
            )
        )
        if (r + 1) % 4 == 0 and r + 1 < MAX_WORD:
            state = state.localCheckpoint(eager=True)
    return unk.unionByName(
        state.select(
            "w",
            "cnt",
            F.size(F.split("pieces", " ")).cast("long").alias("n_pieces"),
            "pieces",
        )
    )


def wordpiece_top_words(
    docs: DataFrame,
    text: str = "text",
    min_df: int = 3,
    top_k: int = 300,
) -> DataFrame:
    """Contract face: encode the corpus dictionary and return the
    ``top_k`` words by occurrence (ties word asc) with their piece
    decomposition — (word, n_occ, n_pieces, pieces)."""
    words = corpus_words(docs, text).localCheckpoint(eager=True)
    vocab = wordpiece_vocab(words, min_df).localCheckpoint(eager=True)
    enc = wordpiece_encode_words(words, vocab)
    return (
        enc.orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(top_k)
        .select(
            F.col("w").alias("word"),
            F.col("cnt").cast("long").alias("n_occ"),
            "n_pieces",
            "pieces",
        )
    )


def wordpiece_oracle_sql(
    docs_src: str = "documents",
    text: str = "text",
    min_df: int = 3,
    top_k: int = 300,
) -> str:
    """Chained-CTE DuckDB twin: same vocab derivation and all
    MAX_WORD greedy rounds replayed with integer/string logic only."""
    rounds = []
    for k in range(1, MAX_WORD + 1):
        rounds.append(f"""m{k} as materialized (
   select s.w, max(l) as l
   from s{k - 1} s, unnest(range(1,
        least({MAX_PIECE}, s.len - s.pos + 1) + 1)) as t(l)
   join vocab v on v.piece = substring(s.w, s.pos, cast(l as int))
              and v.at_start = (s.pos = 1)
   where not s.done
   group by s.w
 ),
 s{k} as materialized (
   select s.w, s.cnt, s.len,
     case when s.done then s.pos
          else s.pos + cast(m.l as int) end as pos,
     case when s.done then s.pieces
          when s.pos = 1 then substring(s.w, s.pos, cast(m.l as int))
          else s.pieces || ' ##' ||
               substring(s.w, s.pos, cast(m.l as int)) end as pieces,
     s.done or (s.pos + cast(m.l as int) > s.len) as done
   from s{k - 1} s left join m{k} m on s.w = m.w
 )""")
    round_sql = ",\n ".join(rounds)
    return f"""
 with toks as (
   select unnest(regexp_extract_all(lower({text}), '[a-z]+', 0)) as w
   from {docs_src}
 ),
 words as materialized (select w, count(*) as cnt from toks group by w),
 enc0 as materialized (select w, cnt, cast(length(w) as int) as len from words
          where length(w) <= {MAX_WORD}),
 unk as (select w, cnt, cast(1 as bigint) as n_pieces,
                '[UNK]' as pieces
         from words where length(w) > {MAX_WORD}),
 startp as (
   select substring(w, 1, cast(l as int)) as piece, true as at_start,
          count(distinct w) as df
   from enc0, unnest(range(1, least({MAX_PIECE}, len) + 1)) as t(l)
   group by 1, 2
 ),
 contp as (
   select substring(w, cast(p as int), cast(l as int)) as piece,
          false as at_start, count(distinct w) as df
   from enc0,
        unnest(range(2, len + 1)) as tp(p),
        unnest(range(1, {MAX_PIECE} + 1)) as tl(l)
   where p + l - 1 <= len
   group by 1, 2
 ),
 vocab as materialized (
   select piece, at_start from startp
   where df >= {min_df} or length(piece) = 1
   union all
   select piece, at_start from contp
   where df >= {min_df} or length(piece) = 1
 ),
 s0 as materialized (select w, cnt, len, 1 as pos, '' as pieces,
               len = 0 as done from enc0),
 {round_sql}
 select word, n_occ, n_pieces, pieces from (
   select w as word, cast(cnt as bigint) as n_occ,
          cast(len(string_split(pieces, ' ')) as bigint) as n_pieces,
          pieces
   from s{MAX_WORD}
   union all
   select w, cast(cnt as bigint), n_pieces, pieces from unk
 )
 order by n_occ desc, word asc
 limit {top_k}
"""
