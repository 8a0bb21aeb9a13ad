"""Corpus-quality curation from the public LLM-data-pipeline
literature: Gopher-style repetition statistics (Rae et al. 2021,
"Scaling Language Models" §A1.1), C4-style line filtering (Raffel et
al. 2020 §2.2), and benchmark decontamination by n-gram overlap
(Brown et al. 2020 §C; Dolma, Soldaini et al. 2024).

These complement the near-dup operators in ``textdedup``: dedupe
removes redundant documents; these score/clean the survivors before
training. All three are pure JVM column expressions — no Python UDFs —
so they stay inside whole-stage codegen and scale as:

- ``repetition_stats``: ONE shuffle keyed (doc_id, n, gram) with
  map-side partial aggregation, then a window partitioned by
  (doc_id, n) — never a global window. Gram fan-out is bounded by
  words-per-doc x len(ns).
- ``c4_line_filter``: shuffle-free projection (higher-order ``filter``
  over the split-lines array); Catalyst pushes it below/above
  neighbors freely.
- ``decontam_flags``: the eval side is tiny by construction (a
  benchmark suite is KBs-MBs vs a 100 TB corpus), so it broadcasts;
  the corpus side is a map-only scan + partial count — no corpus
  shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _words(text: str) -> str:
    return f"split(trim(lower({text})), '\\\\s+')"


def gram_array(n: int, text: str = "text") -> Column:
    """ALL word n-gram occurrences (non-distinct, in order) — unlike
    ``textdedup.shingles`` which is the distinct set. sequence(1,0) is
    descending in Spark, so short docs short-circuit to array()."""
    w = _words(text)
    return F.expr(
        f"case when size({w}) >= {n} then "
        f"transform(sequence(1, size({w}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({w}, i, {n}))) "
        f"else array() end"
    )


def gram_array_from(arr_col: str, n: int) -> Column:
    """Same n-gram array as :func:`gram_array` but over an
    ALREADY-BOUND token-array column — use this when the array can be
    bound in a prior select: transform lambdas defeat codegen
    subexpression elimination, so an inlined split macro re-splits
    the text once per slice (O(words^2) per doc)."""
    return F.expr(
        f"case when size({arr_col}) >= {n} then "
        f"transform(sequence(1, size({arr_col}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({arr_col}, i, {n}))) "
        f"else array() end"
    )


def repetition_stats(
    df: DataFrame, ns: tuple = (2, 3, 4), id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Gopher repetition filter inputs: for each n in ``ns``, the
    fraction of the doc's characters covered by its single most
    frequent word n-gram (count x len(gram) / len(doc), capped at 1.0
    since overlapping occurrences double-count characters; ties broken
    by gram text ascending for determinism). Docs above ~0.2 at n=2
    are boilerplate/templating candidates in the Gopher recipe.

    Output: (id_col, top{n}_gram, top{n}_frac) per n, one row per doc
    that yields at least one gram for ANY n (independent of the order
    of ``ns``). Single corpus scan: the (n, gram) pairs for every n are
    exploded from one flattened per-row array, counted with ONE
    hash-agg shuffle, ranked per (doc, n), then pivoted back to per-n
    columns by a map-side-combinable max(when) aggregation — no per-n
    re-scan and no per-n self-join chain.
    """
    w = _words(text)
    per_n = ", ".join(
        f"case when size(_w) >= {n} then "
        f"transform(sequence(1, size(_w) - {n} + 1), "
        f"i -> named_struct('n', {n}, 'gram', concat_ws(' ', slice(_w, i, {n})))) "
        f"else array() end"
        for n in ns
    )
    pairs = (
        df.select(
            F.col(id_col),
            F.length(F.expr(f"trim({text})")).alias("doc_chars"),
            F.expr(w).alias("_w"),
        )
        .select(
            id_col,
            "doc_chars",
            F.explode(F.expr(f"flatten(array({per_n}))")).alias("g"),
        )
        .select(id_col, "doc_chars", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    )
    counts = pairs.groupBy(id_col, "n", "doc_chars", "gram").agg(
        F.count("*").alias("cnt")
    )
    rw = Window.partitionBy(id_col, "n").orderBy(F.desc("cnt"), F.asc("gram"))
    top = (
        counts.withColumn("_rn", F.row_number().over(rw))
        .filter(F.col("_rn") == 1)
        .withColumn(
            "frac",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("cnt") * F.length("gram") / F.col("doc_chars"),
                ),
                6,
            ),
        )
    )
    aggs = []
    for n in ns:
        aggs.append(
            F.max(F.when(F.col("n") == n, F.col("gram"))).alias(f"top{n}_gram")
        )
        aggs.append(
            F.max(F.when(F.col("n") == n, F.col("frac"))).alias(f"top{n}_frac")
        )
    return top.groupBy(id_col).agg(*aggs)


# C4 line-level heuristics (Raffel et al. 2020 §2.2): keep a line only
# if it ends in terminal punctuation, has >= min_words words, and is
# free of boilerplate markers. The bad-marker list is the public C4
# one (lorem ipsum, javascript, curly brace as a code tell).
_C4_BAD_MARKERS = ("lorem ipsum", "javascript", "{")


def c4_line_filter(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", min_words: int = 3
) -> DataFrame:
    """Per-document line cleaning: split on newline, keep lines that
    (a) end with . ! ? or closing quote, (b) have >= ``min_words``
    whitespace words, (c) contain no boilerplate marker. Returns the
    cleaned text plus kept/total line counts; shuffle-free."""
    marker_checks = " and ".join(
        f"not contains(lower(l), '{m}')" for m in _C4_BAD_MARKERS
    )
    kept = F.expr(
        f"filter(split({text}, '\\n'), l -> "
        f"trim(l) rlike '[.!?\"]$' "
        f"and size(split(trim(l), '\\\\s+')) >= {min_words} "
        f"and {marker_checks})"
    )
    lines = F.expr(f"split({text}, '\\n')")
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        # long: oracle-side len() is BIGINT (contract-surface rule)
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
    )


def paragraph_dedupe(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", sep: str = "\n\n"
) -> DataFrame:
    """Corpus-level paragraph dedupe (Dolma, Soldaini et al. 2024
    §4.1.3; CCNet, Wenzek et al. 2020): across the WHOLE corpus keep
    only the first occurrence — ordered by (doc, position) — of each
    distinct trimmed paragraph, and rebuild every document from its
    surviving paragraphs in original order.

    Keep-first is computed as ``groupBy(paragraph).agg(min(struct(doc,
    pos)))`` + a co-partitioned join back, NOT a row_number window per
    paragraph: partial (map-side) aggregation makes a boilerplate
    paragraph with 10^8 occurrences a non-event, whereas a window
    would sort all of them in one partition — the classic hot-key
    skew of web boilerplate ("thank you for reading").

    Output: (id_col, clean_text, n_paras, n_kept); docs whose every
    paragraph was seen earlier come back with clean_text = ''.
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text), sep)).alias("pos", "para"),
    ).withColumn("para", F.trim("para")).filter(F.length("para") > 0)
    winner = paras.groupBy("para").agg(
        F.min(F.struct(id_col, "pos")).alias("_w")
    )
    marked = paras.join(winner, "para").withColumn(
        "_keep",
        (F.col("_w")[id_col] == F.col(id_col)) & (F.col("_w")["pos"] == F.col("pos")),
    )
    return marked.groupBy(id_col).agg(
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_keep"), F.struct("pos", "para"))
                        )
                    ),
                    lambda s: s["para"],
                ),
                sep,
            ),
            F.lit(""),
        ).alias("clean_text"),
        F.count("*").cast("long").alias("n_paras"),
        F.sum(F.col("_keep").cast("long")).cast("long").alias("n_kept"),
    )


def dup_line_stats(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Gopher's within-document duplicate-line signals (Rae et al.
    2021 §A1.1): the fraction of a doc's lines that belong to a line
    value occurring more than once in that doc, and the same fraction
    weighted by characters. Definition pinned precisely: a line
    occurrence counts as duplicated iff its trimmed text appears >= 2
    times in the SAME document; empty lines are ignored.

    Within-doc only, so the aggregation keys carry the doc id — no
    corpus-wide hot keys; two partial-agg shuffles, all JVM.

    Output: (id_col, n_lines, dup_line_frac, dup_line_char_frac).
    """
    lines = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text), "\n")).alias("line"))
        .withColumn("line", F.trim("line"))
        .filter(F.length("line") > 0)
    )
    counts = lines.groupBy(id_col, "line").agg(F.count("*").alias("cnt"))
    return counts.groupBy(id_col).agg(
        F.sum("cnt").alias("n_lines"),
        F.round(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
            / F.sum("cnt"),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt") * F.length("line")).otherwise(0)
            )
            / F.sum(F.col("cnt") * F.length("line")),
            6,
        ).alias("dup_line_char_frac"),
    )


def dup_ngram_stats(
    df: DataFrame,
    ns: tuple = (5, 6, 7, 8, 9, 10),
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Gopher's duplicate n-gram character coverage (Rae et al. 2021
    §A1.1 rows 5-10, the companion of ``repetition_stats``' top-gram
    rows 2-4): for each n, the fraction of the doc's characters covered
    by n-grams whose value occurs >= 2 times in the SAME document
    (sum of count x len(gram) / len(doc), capped at 1.0 — overlapping
    occurrences double-count characters, the repetition_stats
    convention).

    Single corpus scan (the flattened per-n gram-array idiom), ONE
    (doc, n, gram) hash agg, ONE per-(doc, n) rollup, then the per-doc
    pivot via max(when) — all map-side combinable; keys carry the doc
    id, so no corpus-wide hot keys.

    Output: (id_col, dup{n}_frac per n), one row per doc that yields
    at least one gram for ANY n (i.e. >= min(ns) words).
    """
    w = _words(text)
    per_n = ", ".join(
        f"case when size(_w) >= {n} then "
        f"transform(sequence(1, size(_w) - {n} + 1), "
        f"i -> named_struct('n', {n}, 'gram', concat_ws(' ', slice(_w, i, {n})))) "
        f"else array() end"
        for n in ns
    )
    pairs = (
        df.select(
            F.col(id_col),
            F.length(F.expr(f"trim({text})")).alias("doc_chars"),
            F.expr(w).alias("_w"),
        )
        .select(
            id_col,
            "doc_chars",
            F.explode(F.expr(f"flatten(array({per_n}))")).alias("g"),
        )
        .select(
            id_col, "doc_chars",
            F.col("g.n").alias("n"), F.col("g.gram").alias("gram"),
        )
    )
    counts = pairs.groupBy(id_col, "n", "doc_chars", "gram").agg(
        F.count("*").alias("cnt")
    )
    per = counts.groupBy(id_col, "n", "doc_chars").agg(
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.length("gram")).otherwise(0)
        ).alias("dup_chars")
    ).withColumn(
        "frac",
        F.round(
            F.least(F.lit(1.0), F.col("dup_chars") / F.col("doc_chars")), 6
        ),
    )
    return per.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("frac"))).alias(f"dup{n}_frac")
            for n in ns
        ]
    )


def substring_dedupe(
    df: DataFrame, length: int = 8, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Substring-level exact dedupe (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): across the WHOLE
    corpus, any ``length``-token window that occurs more than once
    keeps only its first occurrence — ordered by (doc, position) — and
    every other occurrence's tokens are cut from their documents. The
    granularity between doc-level (``textdedup.dedup_exact``) and
    paragraph-level (``paragraph_dedupe``): it removes boilerplate
    embedded mid-document that neither catches.

    Semantics: covered = the union of non-winner occurrence spans
    [start, start+length); a token survives iff no such span covers
    it. A winner occurrence therefore survives except where a later
    duplicated window overlaps it (self-overlapping runs like
    "a a a a" collapse to their uncovered prefix) — deterministic,
    and exactly what the position-set formulation says.

    Scale: the window fan-out is ~1 row per corpus token; keep-first
    is groupBy(gram).agg(min(struct)) with map-side partial
    aggregation, so a boilerplate window with 10^8 occurrences never
    concentrates on one task (same skew argument as
    ``paragraph_dedupe``). The coverage explode is bounded by
    length x duplicated occurrences (rare by construction), and the
    final rebuild is one aggregation keyed by doc. All JVM.

    Output: (id_col, clean_text, n_tokens, n_dup_tokens), one row per
    doc with >= 1 non-empty token.
    """
    w = _words(text)
    toks = (
        df.select(F.col(id_col), F.posexplode(F.expr(w)).alias("pos", "word"))
        .filter(F.col("word") != "")
    )
    # bind the token array before gram_array's transform lambda (the
    # inlined split is O(words^2) per doc — no subexpr elimination in
    # lambdas); gram_array_from reuses the bound column
    occ = df.select(F.col(id_col), F.expr(w).alias("_gw")).select(
        F.col(id_col),
        F.posexplode(gram_array_from("_gw", length)).alias("start", "gram"),
    )
    winner = occ.groupBy("gram").agg(F.min(F.struct(id_col, "start")).alias("_w"))
    dups = occ.join(winner, "gram").filter(
        ~((F.col("_w")[id_col] == F.col(id_col)) & (F.col("_w")["start"] == F.col("start")))
    )
    covered = dups.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("start"), F.col("start") + F.lit(length - 1))).alias(
            "pos"
        ),
    ).distinct()
    marked = toks.join(
        covered.withColumn("_cov", F.lit(1)), [id_col, "pos"], "left"
    )
    return marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_cov").isNull(), F.struct("pos", "word"))
                    )
                ),
                lambda s: s["word"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("_cov").isNotNull(), 1).otherwise(0)).alias("n_dup_tokens"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """CCNet-style language-model quality proxy (Wenzek et al. 2020
    §3.2 use a real 5-gram KenLM; the unigram corpus LM is the
    degenerate-but-useful case that needs no external model): score
    each document by the mean negative log2-probability of its tokens
    under the corpus unigram distribution. Low bits/token = repetitive
    high-frequency boilerplate; high = rare-token noise (both tails
    are filter candidates in the CCNet recipe).

    Scale: one groupBy(word) with partial aggregation builds the
    frequency table (vocab-sized — shuffled, NOT broadcast, since a
    web-scale vocab is billions of types); the probe join keys on the
    unique-key freq side so hot stopwords stay an ordinary hash-join
    probe, and the per-doc mean partial-aggregates. All JVM.

    Output: (id_col, n_tokens, bits_per_token) per doc with >= 1
    non-empty token; bits rounded to 6 places for portability.
    """
    toks = (
        df.select(F.col(id_col), F.explode(F.expr(_words(text))).alias("word"))
        .filter(F.col("word") != "")
    )
    freq = toks.groupBy("word").agg(F.count("*").alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    scored = toks.join(freq, "word").crossJoin(F.broadcast(total))
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(F.log2(F.col("total") / F.col("cnt"))), 6).alias(
            "bits_per_token"
        ),
    )


def bigram_logprob(
    df: DataFrame,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Interpolated bigram LM quality score — one rung up the CCNet
    KenLM ladder from :func:`unigram_logprob`: per-doc mean negative
    log2-probability of each token given its predecessor under
    P(w|v) = lam·P_ML(w|v) + (1-lam)·P_add1(w), where P_ML is the
    corpus bigram maximum-likelihood estimate (count(v,w)/count(v·))
    and the add-1-smoothed unigram is the backoff mass so unseen
    continuations stay finite. Repetitive boilerplate scores very low
    (its bigrams are corpus-frequent); incoherent token salad scores
    high — both tails are CCNet-style filter candidates.

    Scale: token pairs come from an in-row zip of adjacent words
    (shuffle-free UDTF-like explode); the corpus bigram table is built
    by one groupBy (vocab²-sized in theory, corpus-bounded in fact —
    shuffled, never broadcast) and probed with ordinary hash joins
    keyed on its unique key; the per-doc mean partial-aggregates. All
    JVM expressions.

    Output: (id_col, n_bigrams, bits_per_token) for docs with >= 2
    non-empty tokens, rounded to 6 places.
    """
    w = f"filter({_words(text)}, x -> x <> '')"
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"case when size({w}) >= 2 then "
                f"arrays_zip(slice({w}, 1, size({w}) - 1), "
                f"slice({w}, 2, size({w}) - 1)) "
                f"else array() end"
            )
        ).alias("_bg"),
    ).select(id_col, F.col("_bg.0").alias("prev"), F.col("_bg.1").alias("cur"))
    bi = pairs.groupBy("prev", "cur").agg(F.count("*").alias("cnt_bi"))
    prev_tot = bi.groupBy("prev").agg(F.sum("cnt_bi").alias("cnt_prev"))
    toks = (
        df.select(F.col(id_col), F.explode(F.expr(_words(text))).alias("word"))
        .filter(F.col("word") != "")
    )
    uni = toks.groupBy("word").agg(F.count("*").alias("cnt_uni"))
    tot = uni.agg(F.sum("cnt_uni").alias("total"), F.count("*").alias("vocab"))
    p = (
        pairs.join(bi, ["prev", "cur"])
        .join(prev_tot, "prev")
        .join(uni, pairs["cur"] == uni["word"])
        .crossJoin(F.broadcast(tot))
        .select(
            F.col(id_col),
            (
                F.lit(lam) * F.col("cnt_bi") / F.col("cnt_prev")
                + F.lit(1.0 - lam)
                * (F.col("cnt_uni") + 1.0)
                / (F.col("total") + F.col("vocab"))
            ).alias("_p"),
        )
    )
    return p.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(-F.log2("_p")), 6).alias("bits_per_token"),
    )


def kn_bigram_logprob(
    df: DataFrame,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
    Chen & Goodman 1999's interpolated form) — the smoothing KenLM
    actually ships, one rung up from :func:`bigram_logprob`'s
    ML+add-1 interpolation:

    P(w|v) = max(c(v,w) − D, 0)/c(v·) + (D·N1+(v·)/c(v·)) · P_cont(w)
    P_cont(w) = N1+(·w) / N1+(··)

    where D is the absolute discount, N1+(v·) counts DISTINCT
    continuations of v, N1+(·w) counts DISTINCT predecessors of w
    (the "how many contexts has this word followed" novelty signal —
    'Francisco' is frequent but predictable, so KN demotes it), and
    N1+(··) is the bigram type count. Scoring the training corpus
    itself keeps every probability finite without an OOV branch: all
    scored pairs exist, so the discounted term is ≥ (1−D)/c(v·) > 0.

    Scale shape mirrors :func:`bigram_logprob`: in-row adjacent-pair
    zip (shuffle-free), ONE bigram groupBy (corpus-bounded, shuffled
    never broadcast), two metadata aggs over the bigram TYPE table
    (strictly smaller), hash-join probes on the pair key, per-doc
    mean partial-aggregates. D is a parameter, never estimated from
    n1/n2 counts, so both engines hold the identical double.

    Output: (id_col, n_bigrams, bits_per_token) for docs with >= 2
    non-empty tokens, rounded to 6 places.
    """
    w = f"filter({_words(text)}, x -> x <> '')"
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"case when size({w}) >= 2 then "
                f"arrays_zip(slice({w}, 1, size({w}) - 1), "
                f"slice({w}, 2, size({w}) - 1)) "
                f"else array() end"
            )
        ).alias("_bg"),
    ).select(id_col, F.col("_bg.0").alias("prev"), F.col("_bg.1").alias("cur"))
    bi = pairs.groupBy("prev", "cur").agg(F.count("*").alias("cnt_bi"))
    prev_tot = bi.groupBy("prev").agg(
        F.sum("cnt_bi").alias("cnt_prev"),
        F.count("*").alias("n1p_prev"),
    )
    cont = bi.groupBy("cur").agg(F.count("*").alias("n1p_cur"))
    types = bi.agg(F.count("*").alias("n_types"))
    d = F.lit(discount)
    p = (
        pairs.join(bi, ["prev", "cur"])
        .join(prev_tot, "prev")
        .join(cont, "cur")
        .crossJoin(F.broadcast(types))
        .select(
            F.col(id_col),
            (
                F.greatest(F.col("cnt_bi") - d, F.lit(0.0)) / F.col("cnt_prev")
                + (d * F.col("n1p_prev") / F.col("cnt_prev"))
                * (F.col("n1p_cur") / F.col("n_types"))
            ).alias("_p"),
        )
    )
    return p.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(-F.log2("_p")), 6).alias("bits_per_token"),
    )


def perplexity_buckets(
    df: DataFrame,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """CCNet head/middle/tail perplexity split (Wenzek et al. 2020
    §3.2: each language's documents are bucketed into equal thirds by
    LM perplexity; 'head' = lowest perplexity = most Wikipedia-like,
    and the buckets drive what gets kept/downsampled). The LM here is
    :func:`bigram_logprob`'s interpolated bigram — the same rung of
    the KenLM ladder the rest of this module uses.

    Bucket assignment is exact ``ntile(3)`` semantics over the total
    order (bits_per_token, id) — NOT a quantile-threshold
    approximation — computed without a single-partition window: the
    scored frame gets a global rank from the scheduler's three-level
    :func:`~tspider_spark.operators.schedule.distributed_rank`
    (lead bucket = the integer milli-bits prefix of the score, so
    bucket order == score order), and the closed-form ntile formula
    maps rank r of n into bucket b: the first n%3 buckets take
    ceil(n/3) rows, the rest floor(n/3). Scale: one hash exchange on
    the milli-bits bucket (thousands of distinct values), one
    metadata-sized prefix-sum join — the 10^10-doc shape of CCNet's
    per-shard sort-and-split.

    Output: (id_col, n_bigrams, bits_per_token, bucket) with bucket in
    {'head','middle','tail'}.
    """
    from tspider_spark.operators.schedule import distributed_rank

    scored = bigram_logprob(df, lam=lam, id_col=id_col, text=text)
    scored = scored.withColumn(
        "_mb", F.floor(F.col("bits_per_token") * 1000).cast("long")
    )
    ranked = distributed_rank(
        scored, ("_mb", "bits_per_token", id_col), "_r"
    ).drop("_mb")
    n_row = ranked.agg(F.count(F.lit(1)).alias("_n"))
    r, n = F.col("_r"), F.col("_n")
    big, small = F.ceil(n / 3), F.floor(n / 3)
    cut = (n % 3) * big  # rows covered by the ceil-sized buckets
    b = F.when(r <= cut, F.ceil(r / big)).otherwise(
        (n % 3) + F.ceil((r - cut) / small)
    )
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .select(
            id_col,
            "n_bigrams",
            "bits_per_token",
            F.element_at(
                F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
                b.cast("int"),
            ).alias("bucket"),
        )
    )


def decontam_flags(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C / Dolma): flag every
    corpus doc sharing at least one word n-gram with the eval set
    (13-grams in the papers; pass smaller n for short docs). Returns
    (id_col, n_contaminated_grams) for flagged docs only — anti-join
    the result against the corpus to drop them.

    The eval side is collapsed to its distinct gram set and broadcast,
    so the corpus is scanned once with a map-side hash probe — the
    only aggregation shuffle is on the (rare) flagged doc ids."""
    from tspider_spark.operators.textdedup import shingles

    d = shingles(docs, n, id_col, text)
    e = shingles(eval_docs, n, id_col, text).select("shingle").distinct()
    return (
        d.join(F.broadcast(e), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_grams"))
    )


# --- PII redaction (Dolma §4.2 / BigScience data tooling) ---------------

# (name, regex, replacement token). Patterns are deliberately kept in
# the Java-regex ∩ RE2 dialect (no lookaround, no backrefs) so the
# DuckDB oracle runs the exact same expressions. Redaction order is
# load-bearing: emails first (they contain digit runs), then IPs (a
# later phone pass must not eat 3-digit octet fragments), then phones.
PII_PATTERNS = [
    ("emails",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "|||EMAIL|||"),
    ("ips",
     r"\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
     r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b",
     "|||IP|||"),
    ("phones",
     r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
     "|||PHONE|||"),
]


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """PII redaction (Dolma, Soldaini et al. 2024 §4.2): replace
    email / IPv4 / US-style phone matches with stable placeholder
    tokens and report per-doc match counts. Returns
    (id_col, clean_text, n_emails, n_ips, n_phones).

    Counts are taken on the text as it stands BEFORE that pattern's
    own redaction (sequential pipeline), so the three counters are
    disjoint — a redacted email's digits can never recount as a
    phone. Pure JVM ``regexp_count``/``regexp_replace`` projection:
    shuffle-free at any scale, stays inside whole-stage codegen."""
    cur = F.col(text)
    counts = []
    for name, pat, tok in PII_PATTERNS:
        # long: oracle-side len() is BIGINT (contract-surface rule)
        counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, tok)
    return docs.select(
        F.col(id_col), cur.alias("clean_text"), *counts
    )


def pii_redact_oracle_sql(
    src: str = "documents", text: str = "text", prelude: str = ""
) -> str:
    """DuckDB twin of ``pii_redact`` (same patterns, same order).
    ``prelude``: extra leading CTEs (``"name as (...),"``) so ``src``
    can be a derived table."""
    steps, prev = [], text
    for i, (name, pat, _tok) in enumerate(PII_PATTERNS):
        p = pat.replace("'", "''")
        tok = _tok
        steps.append(
            f" s{i} as (select *,"
            f" len(regexp_extract_all({prev}, '{p}')) as n_{name},"
            f" regexp_replace({prev}, '{p}', '{tok}', 'g') as t{i}"
            f" from {'s' + str(i - 1) if i else src})"
        )
        prev = f"t{i}"
    n = len(PII_PATTERNS) - 1
    cols = ", ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return (
        "with " + prelude + ",".join(steps)
        + f" select doc_id, t{n} as clean_text, {cols} from s{n}"
    )


def normalize_text(
    docs: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """ftfy-lite text normalization (CCNet/Dolma pre-clean): NFC
    unicode normalization, tabs -> spaces, control chars stripped
    (newlines kept), space runs collapsed, spaces trimmed around
    newlines, 3+ blank lines collapsed to one, outer whitespace
    trimmed. Returns (id_col, clean_text, n_chars_raw, n_chars).

    NFC is the one step with no JVM builtin: a ``pandas_udf`` running
    the vectorized ``Series.str.normalize`` (one Arrow batch call, not
    per-row Python). Everything after is JVM ``regexp_replace`` in the
    RE2 ∩ Java dialect so the DuckDB oracle (``nfc_normalize`` + the
    same regexes) matches byte for byte."""
    from pyspark.sql.functions import pandas_udf

    _nfc = pandas_udf(lambda s: s.str.normalize("NFC"), "string")
    # controls strip BEFORE NFC: stripping can make a base letter and
    # a combining mark adjacent (e, \x07, U+0301), and only the
    # NFC-after order composes them — the reverse breaks idempotence
    # (caught by the random-property test)
    c = F.replace(F.col(text), F.lit("\t"), F.lit(" "))
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
    c = _nfc(c)
    c = F.regexp_replace(c, " {2,}", " ")
    c = F.regexp_replace(c, " *\n *", "\n")
    c = F.regexp_replace(c, "\n{3,}", "\n\n")
    c = F.regexp_replace(c, "^[ \n]+|[ \n]+$", "")
    return docs.select(
        F.col(id_col),
        c.alias("clean_text"),
        F.length(text).cast("long").alias("n_chars_raw"),
        F.length(c).cast("long").alias("n_chars"),
    )


def normalize_text_oracle_sql(src: str = "documents", text: str = "text") -> str:
    """DuckDB twin of ``normalize_text`` (same steps, same order)."""
    c = f"replace({text}, chr(9), ' ')"
    c = f"regexp_replace({c}, '[\\x00-\\x08\\x0B-\\x1F\\x7F]', '', 'g')"
    c = f"nfc_normalize({c})"
    c = f"regexp_replace({c}, ' {{2,}}', ' ', 'g')"
    c = f"regexp_replace({c}, ' *\\n *', chr(10), 'g')"
    c = f"regexp_replace({c}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    c = f"regexp_replace({c}, '^[ \\n]+|[ \\n]+$', '', 'g')"
    return (
        f"select doc_id, {c} as clean_text,"
        f" cast(length({text}) as bigint) as n_chars_raw,"
        f" cast(length({c}) as bigint) as n_chars from {src}"
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — hashed-ngram
    importance reduced to its unigram case): score each raw-corpus doc
    by the mean log2 likelihood ratio of its tokens under the TARGET
    unigram LM vs the RAW-corpus unigram LM, add-1 smoothed over the
    union vocabulary. High log2_weight = target-like; feed the weights
    to ``curate.sample_by_hash``-style keep rules to resample the raw
    pool toward the target distribution.

    Scale shape matches ``unigram_logprob``: both frequency tables are
    vocab-sized groupBys (shuffled, never broadcast — web-scale vocabs
    are billions of types), the totals are a 1-row broadcast, and the
    probe join keys the unique-key freq side. All JVM.

    Output: (id_col, n_tokens, log2_weight), weights rounded to 6.
    """
    toks = (
        corpus.select(F.col(id_col), F.explode(F.expr(_words(text))).alias("word"))
        .filter(F.col("word") != "")
    )
    ttoks = (
        target.select(F.explode(F.expr(_words(text))).alias("word"))
        .filter(F.col("word") != "")
    )
    fr = toks.groupBy("word").agg(F.count("*").alias("cnt_r"))
    ft = ttoks.groupBy("word").agg(F.count("*").alias("cnt_t"))
    freq = (
        fr.join(ft, "word", "full")
        .select(
            "word",
            F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
            F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"),
        )
    )
    totals = freq.agg(
        F.sum("cnt_r").alias("tot_r"),
        F.sum("cnt_t").alias("tot_t"),
        F.count(F.lit(1)).alias("v"),
    )
    scored = toks.join(freq, "word").crossJoin(F.broadcast(totals))
    lw = F.log2(
        (F.col("cnt_t") + 1) / (F.col("tot_t") + F.col("v"))
    ) - F.log2((F.col("cnt_r") + 1) / (F.col("tot_r") + F.col("v")))
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(lw), 6).alias("log2_weight"),
    )


def dsir_resample(
    corpus: DataFrame,
    target: DataFrame,
    m: int,
    temp: float = 1.0,
    id_col: str = "doc_id",
    text: str = "text",
    salt: str = "dsir",
) -> DataFrame:
    """DSIR importance RESAMPLING — the selection step Xie et al. 2023
    run after weighting: draw ``m`` docs from the raw pool with
    probability ∝ exp(weight/temp), without replacement, via the
    Gumbel-top-k trick (Kool et al. 2019): key = weight/temp + Gumbel
    noise, take the m largest keys. The noise is hash-derived
    (``curate.hash_uniform``'s md5 uniform → -ln(-ln(u))), so the draw
    is deterministic and reproducible across engines, runs, cluster
    sizes and corpus partitionings — same contract as the stratified
    sampler — and exactly replayable by the DuckDB oracle.

    Scale: weights come from :func:`dsir_weights` (vocab tables
    shuffled, never broadcast); the selection is a global top-m — a
    distributed TakeOrdered (per-partition top-m then a bounded merge),
    NEVER a single-partition rank window. Ties (bit-equal keys) break
    by id for determinism.

    Output: the m selected (id_col, n_tokens, log2_weight, sample_key)
    rows, key rounded to 6.
    """
    from tspider_spark.operators.curate import hash_uniform

    w = dsir_weights(corpus, target, id_col, text)
    u = hash_uniform(F.col(id_col), salt)
    keyed = w.select(
        id_col,
        "n_tokens",
        "log2_weight",
        (F.col("log2_weight") / F.lit(float(temp)) - F.log(-F.log(u))).alias(
            "_key"
        ),
    )
    return (
        keyed.orderBy(F.desc("_key"), F.col(id_col))
        .limit(m)
        .select(
            id_col,
            "n_tokens",
            "log2_weight",
            F.round("_key", 6).alias("sample_key"),
        )
    )


# Gopher document-level filter (Rae et al. 2021 Table A1) — the
# composite gate over the cheap shuffle-free signals plus the
# dup-line stats; the n-gram repetition rules live separately in
# repetition_stats (they need the gram shuffle).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher quality rules as one pass/fail gate with reasons:
    word count in [min_words, max_words]; mean word length in [3, 10];
    symbol-to-word ratio ('#' or '...') <= 0.1; <= 90% of non-empty
    lines bullet-led and <= 30% ellipsis-ended; >= 80% of words
    containing an alphabetic char; >= 2 of the 8 Gopher stopwords
    present; within-doc dup-line fraction <= 0.30 and dup-line char
    fraction <= 0.20 (from ``dup_line_stats``).

    Everything except the dup-line join is a shuffle-free JVM
    projection over the words/lines arrays; the output carries only
    booleans and reason strings (no floats), so it is hash-stable
    across engines. Output: (id_col, passes, fail_reasons).
    """
    words = f"filter({_words(text)}, w -> w <> '')"
    lines = (
        f"filter(transform(split({text}, '\\n'), l -> trim(l)), "
        "l -> l <> '')"
    )
    n_words = F.expr(f"size({words})")
    nw1 = F.greatest(n_words, F.lit(1))
    mean_wl = (
        F.expr(f"aggregate({words}, 0L, (a, w) -> a + length(w))") / nw1
    )
    n_hash = F.length(text) - F.length(F.replace(F.col(text), F.lit("#"), F.lit("")))
    n_ell = (
        F.length(text) - F.length(F.replace(F.col(text), F.lit("..."), F.lit("")))
    ) / 3
    sym_ratio = (n_hash + n_ell) / nw1
    n_lines = F.expr(f"size({lines})")
    nl1 = F.greatest(n_lines, F.lit(1))
    bullet_frac = F.expr(
        f"size(filter({lines}, l -> startswith(l, '- ') "
        "or startswith(l, '* ')))"
    ) / nl1
    ell_frac = F.expr(f"size(filter({lines}, l -> endswith(l, '...')))") / nl1
    alpha_frac = F.expr(
        f"size(filter({words}, w -> w rlike '[a-z]'))"
    ) / nw1
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    stop_hits = F.expr(
        f"size(filter(array({stops}), s -> array_contains({words}, s)))"
    )
    dl = dup_line_stats(df, id_col, text).select(
        id_col, "dup_line_frac", "dup_line_char_frac"
    )
    base = df.join(dl, id_col, "left").select(
        F.col(id_col),
        F.coalesce("dup_line_frac", F.lit(0.0)).alias("_dlf"),
        F.coalesce("dup_line_char_frac", F.lit(0.0)).alias("_dlcf"),
        F.col(text),
    )
    reasons = F.array_compact(
        F.array(
            F.when(
                (n_words < min_words) | (n_words > max_words), "word_count"
            ),
            F.when((mean_wl < 3) | (mean_wl > 10), "mean_word_length"),
            F.when(sym_ratio > 0.1, "symbol_ratio"),
            F.when(bullet_frac > 0.9, "bullet_lines"),
            F.when(ell_frac > 0.3, "ellipsis_lines"),
            F.when(alpha_frac < 0.8, "alpha_words"),
            F.when(stop_hits < 2, "stopwords"),
            F.when(F.col("_dlf") > 0.3, "dup_lines"),
            F.when(F.col("_dlcf") > 0.2, "dup_line_chars"),
        )
    )
    return base.select(
        F.col(id_col),
        (F.size(reasons) == 0).alias("passes"),
        reasons.alias("fail_reasons"),
    )


def source_quality_rollup(
    df: DataFrame,
    group_cols: tuple = ("source", "lang"),
    min_docs: int = 20,
    min_mean_quality: float = 0.5,
    text: str = "text",
) -> DataFrame:
    """Provenance-level quality gating (the FineWeb / RefinedWeb move
    of filtering whole domains, not just documents): aggregate the
    per-document quality heuristic over a provenance key (source,
    language) and flag strata that are too small or too low-quality to
    keep. Document filters miss systematically-bad providers whose
    every page scrapes as mediocre; rolling quality up to the
    provenance key catches them in one pass.

    Scale: the per-doc scores are codegen'd projections; the rollup is
    ONE groupBy over a low-cardinality provenance key with map-side
    partial aggregation, so each task emits at most (#strata) rows
    into the exchange — hot sources cost nothing extra. Output:
    (group_cols..., n_docs, mean_quality, mean_tokens,
    low_quality_frac, keep) with floats rounded to 6.
    """
    from tspider_spark.operators.textstats import quality_score, token_count

    scored = df.withColumn("_q", quality_score(text)).withColumn(
        "_t", token_count(text)
    )
    return (
        scored.groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("_q"), 6).alias("mean_quality"),
            F.round(F.avg("_t"), 6).alias("mean_tokens"),
            F.round(
                F.avg((F.col("_q") < F.lit(min_mean_quality)).cast("double")), 6
            ).alias("low_quality_frac"),
        )
        .withColumn(
            "keep",
            (F.col("n_docs") >= F.lit(min_docs))
            & (F.col("mean_quality") >= F.lit(min_mean_quality)),
        )
    )


def fuzzy_decontam(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    tau: float = 0.8,
    k: int = 32,
    bands: int = 16,
    rows: int = 2,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Fuzzy benchmark decontamination: corpus documents NEAR-duplicating
    a held-out eval document (word-shingle Jaccard >= tau), per the
    fuzzy train-test overlap checks in Llama / PaLM model reports —
    the paraphrase-robust complement to the exact n-gram
    :func:`decontam_flags`.

    Scale shape is the cross-corpus variant of the LSH scale path in
    ``textdedup``: MinHash both sides, band-bucket JOIN corpus x eval
    (never corpus x corpus), then exact-Jaccard verify restricted to
    candidate docs only via semi-joins. The eval side is benchmark-
    sized; the corpus side is touched by one shingle pass + one banded
    join keyed on (band, bucket). With bands=16, rows=2 a tau=0.8 pair
    is missed with probability (1 - 0.8^2)^16 ≈ 5e-8; the verify step
    guarantees zero false positives.

    Output: (doc_id, eval_id, jaccard) rounded to 6.
    """
    from tspider_spark.operators.textdedup import (
        band_buckets,
        minhash_signatures,
        shingles,
    )

    sh_c = shingles(corpus, n, id_col, text).cache()
    sh_e = shingles(eval_df, n, id_col, text).cache()
    b_c = band_buckets(minhash_signatures(sh_c, k, id_col), bands, rows, id_col)
    b_e = band_buckets(minhash_signatures(sh_e, k, id_col), bands, rows, id_col)
    cand = (
        b_c.select(F.col(id_col).alias("_cid"), "band", "bucket")
        .join(
            b_e.select(F.col(id_col).alias("_eid"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("_cid", "_eid")
        .distinct()
    )
    # verify only candidate docs: semi-join each side's FULL shingle
    # set so per-doc sizes (hence Jaccard) stay exact
    shc = sh_c.join(
        cand.select(F.col("_cid").alias(id_col)).distinct(), id_col, "left_semi"
    ).select(F.col(id_col).alias("_cid"), "shingle")
    she = sh_e.join(
        cand.select(F.col("_eid").alias(id_col)).distinct(), id_col, "left_semi"
    ).select(F.col(id_col).alias("_eid"), "shingle")
    inter = (
        shc.join(she, "shingle")
        .groupBy("_cid", "_eid")
        .agg(F.count(F.lit(1)).alias("_inter"))
        .join(cand, ["_cid", "_eid"], "left_semi")
    )
    size_c = shc.groupBy("_cid").agg(F.count(F.lit(1)).alias("_nc"))
    size_e = she.groupBy("_eid").agg(F.count(F.lit(1)).alias("_ne"))
    jac = F.col("_inter") / (F.col("_nc") + F.col("_ne") - F.col("_inter"))
    return (
        inter.join(size_c, "_cid")
        .join(size_e, "_eid")
        .filter(jac >= tau)
        .select(
            F.col("_cid").alias(id_col),
            F.col("_eid").alias("eval_id"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


def badwords_filter(
    df: DataFrame,
    words: tuple[str, ...] = ("badword", "blocked", "banned"),
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """C4-style bad-words document gate (Raffel et al. 2020 §2.2: any
    page containing a word on the blocklist is dropped; the production
    list is LDNOOBW — here a configurable placeholder list, since the
    semantics under test are the gate, not the lexicon).

    Tokenization is alphanumeric-run based (lowercase, split on
    ``[^a-z0-9]+``) so "BadWord!" and "badword" hit identically —
    word-boundary semantics without engine-specific regex word
    classes, which keeps the DuckDB oracle byte-identical.

    Scale shape: shuffle-free single scan. The blocklist is a literal
    array in the plan (constant-folded, no broadcast variable needed
    at realistic lexicon sizes ~1e3); the hit count is a JVM
    higher-order ``filter`` over the token array — no Python, no
    explode, no join. At 100 TB this is a map-only stage fused into
    whatever scan precedes it.

    Returns (id_col, n_tokens, n_badword_hits, badword_frac, keep)
    with keep = (n_badword_hits == 0), occurrences counted
    non-distinct (a doc repeating one bad word 50 times scores 50).
    """
    wl = F.array(*[F.lit(w.lower()) for w in words])
    toks = F.filter(
        F.split(F.lower(F.col(text)), "[^a-z0-9]+"), lambda t: t != ""
    )
    d = df.select(F.col(id_col), toks.alias("_toks"))
    hits = F.size(F.filter(F.col("_toks"), lambda t: F.array_contains(wl, t)))
    n = F.size("_toks")
    return d.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        hits.cast("long").alias("n_badword_hits"),
        F.round(hits / F.greatest(n, F.lit(1)), 6).alias("badword_frac"),
        (hits == 0).alias("keep"),
    )


def badwords_oracle_sql(
    words: tuple[str, ...] = ("badword", "blocked", "banned"),
    src: str = "documents",
    id_col: str = "doc_id",
    text: str = "text",
) -> str:
    """DuckDB twin of :func:`badwords_filter`."""
    lst = ", ".join(f"'{w.lower()}'" for w in words)
    return f"""
 with t as (
   select {id_col},
          list_filter(string_split_regex(lower({text}), '[^a-z0-9]+'),
                      x -> x <> '') as toks
   from {src}
 )
 select {id_col},
        len(toks)::BIGINT as n_tokens,
        len(list_filter(toks, x -> list_contains([{lst}], x)))::BIGINT
          as n_badword_hits,
        round(len(list_filter(toks, x -> list_contains([{lst}], x)))
              * 1.0 / greatest(len(toks), 1), 6) as badword_frac,
        (len(list_filter(toks, x -> list_contains([{lst}], x))) = 0) as keep
 from t
"""


def gram_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    word n-grams that occur in NO other document — the doc-level
    complement of pairwise dedupe (SoftDeDup downweights by component
    size; this scores how much of each doc is corpus-unique, the
    signal dedup-aware samplers upweight).

    Shape: one shingle explode (distinct per doc) → gram document
    frequency (hash agg on the gram, map-side combinable — stopword-
    ish hot grams are bounded by n ≥ 3 exactly like jaccard_pairs) →
    one id-keyed rollup. Returns (id, n_grams, n_novel,
    novelty[6dp]); docs shorter than n words produce no grams and no
    row (no token mass to score).
    """
    from tspider_spark.operators.textdedup import shingles

    sh = shingles(docs, n, id_col, text)
    df_counts = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    return (
        sh.join(df_counts, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("_df") == 1).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty", F.round(F.col("n_novel") / F.col("n_grams"), 6)
        )
    )
