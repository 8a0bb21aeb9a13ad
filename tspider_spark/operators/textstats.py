"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

Every operator here is expressed with JVM built-ins (codegen'd
projections; simhash is one hash aggregation) — zero Python, and all
DuckDB-oracle-checkable: the same expression semantics exist on both
engines (__spark_entry__ pairs them 1:1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# stopword votes per language — deliberately tiny & deterministic so
# the same CASE logic is expressible in ANSI SQL for the oracle.
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}

PUNCT_CLASS = r"[.,!?;:]"


def words_col(text: str = "text") -> Column:
    return F.split(F.trim(F.lower(F.col(text))), r"\s+")


def token_count(text: str = "text") -> Column:
    """Whitespace tokenization count (the training-pipeline 'token
    count' baseline; BPE-ish subword counting is ``bpeish_token_count``)."""
    return F.size(words_col(text)).cast("long")


def bpeish_token_count(text: str = "text") -> Column:
    """BPE-ish proxy: alphanumeric runs + each punctuation mark counts
    as a token (regexp-extract-all, JVM-side)."""
    return F.size(
        F.expr(rf"regexp_extract_all({text}, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]', 0)")
    ).cast("long")


def punct_count(text: str = "text") -> Column:
    return (
        F.length(text) - F.length(F.regexp_replace(F.col(text), PUNCT_CLASS, ""))
    ).cast("long")


def stopword_count(text: str = "text", lang: str = "en") -> Column:
    stops = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return F.expr(
        f"size(filter(split(trim(lower({text})), '\\\\s+'), w -> w in ({stops})))"
    ).cast("long")


def quality_score(text: str = "text") -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword
    density + punctuation sanity + mean word length band. The exact
    formula matters less than determinism + SQL expressibility."""
    n_tok = token_count(text)
    mean_wl = F.length(text) / F.greatest(n_tok, F.lit(1))
    stop_ratio = stopword_count(text) / F.greatest(n_tok, F.lit(1))
    punct_ratio = punct_count(text) / F.greatest(F.length(text), F.lit(1))
    score = (
        F.when((n_tok >= 10) & (n_tok <= 10000), 0.25).otherwise(0.0)
        + F.when((mean_wl >= 3) & (mean_wl <= 12), 0.25).otherwise(0.0)
        + F.when(stop_ratio >= 0.01, 0.25).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.25).otherwise(0.0)
    )
    return F.round(score, 2)


def lang_votes(text: str = "text") -> dict:
    return {lang: stopword_count(text, lang) for lang in LANG_STOPWORDS}


def lang_id(text: str = "text") -> Column:
    """Stopword-vote language ID; ties broken by fixed lang order.
    'und' when no stopword hits at all."""
    votes = lang_votes(text)
    best = F.greatest(*votes.values())
    out = F.lit("und")
    # reversed so earlier langs win ties via later .when precedence
    for lang in reversed(list(LANG_STOPWORDS)):
        out = F.when((best > 0) & (votes[lang] == best), lang).otherwise(out)
    return out


# Unicode-script character classes in the Java-regex ∩ RE2 dialect
# (\x{hhhh} ranges parse identically in both), so the DuckDB oracle
# runs the same expressions — the pii_redact portability rule.
SCRIPT_CLASSES = {
    "latin": r"[A-Za-z\x{00C0}-\x{024F}]",
    "digit": r"[0-9]",
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "greek": r"[\x{0370}-\x{03FF}]",
    "arabic": r"[\x{0600}-\x{06FF}]",
    "cjk": r"[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}]",
}


def script_stats(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Per-document writing-script profile — the curation companion to
    the stopword :func:`lang_id` (CCNet/Dolma pipelines gate on script
    before language: mixed-script text is a spam/encoding-noise
    signal, and non-target scripts route to different LM models).
    Counts characters per script class (shuffle-free JVM
    ``regexp_count`` projections), plus the dominant script by fixed
    precedence on ties, and the fraction of characters in ANY known
    class (low = binary junk / emoji floods / encoding damage).

    Returns (id, n_chars, <one count per class>, known_ratio,
    dominant) with known_ratio rounded to 6; empty docs get
    known_ratio 0 and dominant 'none'.
    """
    # counts cast to long: DuckDB len()/length() are BIGINT, and the
    # contract-surface rule (r4 verdict #2/#7) is that cross-engine
    # integer columns ship as int64 on both sides
    counts = {
        name: F.regexp_count(F.col(text), F.lit(pat)).cast("long").alias(name)
        for name, pat in SCRIPT_CLASSES.items()
    }
    d = df.select(
        F.col(id_col),
        F.length(F.col(text)).cast("long").alias("n_chars"),
        *counts.values(),
    )
    known = sum((F.col(n) for n in SCRIPT_CLASSES), F.lit(0))
    best = F.greatest(*[F.col(n) for n in SCRIPT_CLASSES])
    dominant = F.lit("none")
    for name in reversed(list(SCRIPT_CLASSES)):  # earlier names win ties
        dominant = F.when((best > 0) & (F.col(name) == best), name).otherwise(
            dominant
        )
    return d.select(
        id_col,
        "n_chars",
        *SCRIPT_CLASSES,
        F.round(
            F.when(F.col("n_chars") > 0, known / F.col("n_chars")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("known_ratio"),
        dominant.alias("dominant"),
    )


def script_stats_oracle_sql(src: str = "documents", text: str = "text") -> str:
    """DuckDB twin of :func:`script_stats` (same regex literals)."""
    cnt = {
        n: f"len(regexp_extract_all({text}, '{p}'))"
        for n, p in SCRIPT_CLASSES.items()
    }
    names = list(SCRIPT_CLASSES)
    known = " + ".join(names)
    best = f"greatest({', '.join(names)})"
    dom = "case "
    for n in names:  # first match in declaration order wins ties
        dom += f"when {best} > 0 and {n} = {best} then '{n}' "
    dom = dom.rstrip()
    return f"""
 with c as (
   select doc_id, length({text}) as n_chars,
          {', '.join(f'{e} as {n}' for n, e in cnt.items())}
   from {src}
 )
 select doc_id, n_chars, {', '.join(names)},
        round(case when n_chars > 0
              then cast({known} as double) / n_chars
              else cast(0 as double) end, 6) as known_ratio,
        {dom} else 'none' end as dominant
 from c
"""


def doc_fingerprint(text: str = "text") -> Column:
    """Canonical content fingerprint: md5 of lower-cased,
    whitespace-collapsed text — the exact-dedupe key."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text))), r"\s+", " ")
    return F.md5(normalized)


SIMHASH_BITS = 60  # md5-hex[0:15] -> 60 portable bits (fits signed i64
# on Spark AND DuckDB, so the whole simhash pipeline is oracle-checkable)


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """60-bit simhash per doc — zero Python, one map-side-combinable
    hash aggregation. Word occurrences (with multiplicity) are exploded
    JVM-side; each word's portable hash (bigint of md5-hex[0:15], the
    same DuckDB-reproducible trick MinHash uses) votes +1/-1 on each of
    the 60 bit positions; the signature sets bits whose vote sum is
    positive. Near-dup docs differ in a few bits; pair generation is in
    textdedup.simhash_dups.

    Plan shape: explode (no shuffle) -> partial agg of 60 long sums
    (map-side combine) -> final agg by id — a single exchange on the
    doc id, ~480 B of buffer per doc.
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text))), r"\s+")).alias("_w"),
    ).filter(F.col("_w") != "")
    h = F.conv(F.substring(F.md5("_w"), 1, 15), 16, 10).cast("long")
    votes = words.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"_b{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sim = sum(
        [
            F.when(F.col(f"_b{b}") > 0, F.lit(1).cast("long") * (1 << b)).otherwise(
                F.lit(0).cast("long")
            )
            for b in range(SIMHASH_BITS)
        ],
        F.lit(0).cast("long"),
    )
    return votes.select(F.col(id_col), sim.alias("sim"))


def hashed_doc_vectors(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    text: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Feature-hashed document embeddings (the hashing trick,
    Weinberger et al. 2009): each token votes ±1 on one of ``dim``
    buckets — bucket and sign both from the portable md5 hash — and
    the per-doc bucket sums form a dense vector, L2-normalized by
    default. This is the model-free bridge from raw text to the
    embedding operators: the cosine/LSH/SQ/IVF/semdedup family runs on
    these vectors when no learned embedding exists (hashed-ngram DSIR
    and fastText-style baselines use exactly this construction).
    Deterministic and engine-portable (same md5 trick as MinHash), so
    the whole text→vector→ANN pipeline stays DuckDB-oracle-checkable.

    Scale: explode (no shuffle) → ONE map-side-combinable aggregation
    keyed on (id, bucket) → per-doc dense assembly via a bounded
    collect_list of ≤ dim entries — no vocab table, no model
    broadcast, memory per doc = dim doubles.

    Output: (id_col, vec: array<double>).
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text))), r"\s+")).alias("_w"),
    ).filter(F.col("_w") != "")
    h = F.conv(F.substring(F.md5("_w"), 1, 15), 16, 10).cast("long")
    sign = F.when(
        F.shiftrightunsigned(h, 40).bitwiseAND(F.lit(1)) == 1, 1.0
    ).otherwise(-1.0)
    buckets = words.select(
        F.col(id_col),
        F.pmod(h, F.lit(dim)).cast("int").alias("_bk"),
        sign.alias("_s"),
    ).groupBy(id_col, "_bk").agg(F.sum("_s").alias("_v"))
    dense = (
        buckets.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("_bk", "_v")))
            ).alias("_m")
        )
        .select(
            F.col(id_col),
            F.expr(
                f"transform(sequence(0, {dim - 1}), "
                f"i -> coalesce(element_at(_m, i), 0.0D))"
            ).alias("vec"),
        )
    )
    if not normalize:
        return dense
    nrm = F.sqrt(
        F.aggregate(
            F.transform("vec", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    return dense.select(
        id_col,
        F.transform("vec", lambda x: x / F.greatest(nrm, F.lit(1e-300))).alias(
            "vec"
        ),
    )


def with_text_stats(df: DataFrame, text: str = "text") -> DataFrame:
    return (
        df.withColumn("n_tokens", token_count(text))
        .withColumn("n_tokens_bpeish", bpeish_token_count(text))
        .withColumn("quality", quality_score(text))
        .withColumn("lang_pred", lang_id(text))
        .withColumn("fingerprint", doc_fingerprint(text))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Okapi BM25 relevance of each document to a bag-of-words query —
    the standard lexical scorer for corpus curation (e.g. keep docs
    relevant to a domain seed list). Fully declarative: corpus stats
    (N, avgdl) ride a broadcast cross join instead of driver scalars,
    term stats are one aggregation each, and the score is a JVM
    projection — no collect, no UDF, shuffles only on (id) and (term).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (positive-clamped variant);
    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).
    Returns (id, bm25) for documents matching ≥1 query term, rounded
    to 6 decimals (cross-engine float portability).
    """
    terms = [t.lower() for t in query_terms]
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text))), r"\s+")).alias("_w"),
    ).filter(F.col("_w") != "")
    doclen = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )
    tf = (
        words.filter(F.col("_w").isin(terms))
        .groupBy(id_col, "_w")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    )
    dfreq = tf.groupBy("_w").agg(F.count(F.lit(1)).cast("double").alias("_df"))
    scored = (
        tf.join(F.broadcast(dfreq), "_w")
        # doclen is per-document (N rows) — shuffle join, never broadcast
        .join(doclen.select(id_col, "_dl"), id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(1.0 + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("_tf") * (k1 + 1))
            / (
                F.col("_tf")
                + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(F.round(F.sum("_s"), 6).alias("bm25"))


def token_quantiles(
    df: DataFrame,
    ps: tuple = (0.5, 0.9),
    stratum_col: str = "lang",
    text: str = "text",
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-stratum token-length distribution — the corpus-profiling
    step before setting length filters / packing sequence budgets.

    ``exact=True`` uses Spark's exact ``percentile`` (linear
    interpolation at rank p*(n-1), matching DuckDB's quantile_cont
    value-for-value) — it buffers each group's values in the
    aggregation, so it is for profiling runs / bounded strata, NOT
    the 10^10-row hot path. ``exact=False`` switches to
    ``approx_percentile`` (Greenwald-Khanna sketch, constant memory,
    mergeable across partitions) — the web-scale path; its error is
    bounded by 1/accuracy of the rank.

    Output: (stratum_col, n_docs, p<P>...) with p columns named by
    percent (p50, p90, ...), rounded to 6 places.
    """
    fn = "percentile" if exact else "approx_percentile"
    extra = "" if exact else f", {accuracy}"
    aggs = [F.count("*").alias("n_docs")] + [
        F.round(F.expr(f"{fn}(_n, {p}{extra})"), 6).alias(
            f"p{int(round(p * 100))}"
        )
        for p in ps
    ]
    return (
        df.select(F.col(stratum_col), token_count(text).alias("_n"))
        .groupBy(stratum_col)
        .agg(*aggs)
    )


def char_entropy_stats(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Per-document character-level statistics — the encoding-noise /
    degenerate-text quality signals of RedPajama-v2 and Dolma
    (``rps_doc_*`` family): Shannon entropy of the character unigram
    distribution in bits (low = repeated-character spam, high for its
    length = binary-garbage mojibake), the most-common-character
    fraction, and the distinct-character count.

    Scale shape: one explode to (doc, char) rows, then a two-level
    aggregation where the first groupBy(doc, char) partial-aggregates
    map-side — each task emits at most (docs-in-partition × alphabet)
    rows into the single (id) exchange, so shuffled bytes are bounded
    by the alphabet, not document length. Entropy uses the
    streaming-friendly identity H = log2(n) - Σ c·log2(c) / n over
    the per-char counts c. All JVM; floats rounded to 6 places.

    Output: (id_col, n_chars, n_unique_chars, entropy_bits,
    top_char_frac) for docs with >= 1 character.
    """
    chars = df.select(
        F.col(id_col), F.explode(F.split(F.col(text), "")).alias("_ch")
    ).filter(F.col("_ch") != "")
    hist = chars.groupBy(id_col, "_ch").agg(F.count(F.lit(1)).alias("_c"))
    n = F.sum("_c")
    return hist.groupBy(id_col).agg(
        n.cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_unique_chars"),
        F.round(
            F.log2(n) - F.sum(F.col("_c") * F.log2("_c")) / n, 6
        ).alias("entropy_bits"),
        F.round(F.max("_c") / n, 6).alias("top_char_frac"),
    )


def tokenizer_fertility(
    df: DataFrame,
    lang_col: str = "lang",
    text: str = "text",
) -> DataFrame:
    """Tokenizer fertility per language: subword tokens per whitespace
    word (the multilingual-budget metric — scripts a tokenizer
    fragments heavily, high fertility, consume proportionally more
    sequence length per word, so byte/doc budgets must be fertility-
    corrected; cf. the XLM-R / NLLB tokenizer analyses) plus chars
    per subword token. Subword proxy is :func:`bpeish_token_count`
    (alphanumeric runs + punctuation marks — deterministic and
    oracle-expressible, standing in for a real BPE the way the
    survey's token-count baseline does).

    One map-side-combinable groupBy on the language key — shuffle
    rows bounded by language cardinality, never corpus size.
    """
    per_doc = df.select(
        F.col(lang_col).alias("lang"),
        token_count(text).alias("_w"),
        bpeish_token_count(text).alias("_t"),
        F.length(F.col(text)).cast("long").alias("_c"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_w").alias("n_words"),
            F.sum("_t").alias("n_subword_tokens"),
            F.sum("_c").alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_subword_tokens",
            F.round(
                F.col("n_subword_tokens").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("fertility"),
            F.round(
                F.col("n_chars").cast("double")
                / F.col("n_subword_tokens").cast("double"),
                6,
            ).alias("chars_per_token"),
        )
    )


def inverted_index(
    df: DataFrame,
    min_df: int = 2,
    max_df: int = 10_000,
    head: int = 20,
    id_col: str = "doc_id",
    text: str = "text",
    max_df_frac: float | None = None,
) -> DataFrame:
    """Distributed inverted-index shard builder: term → document
    frequency + the head of the sorted posting list. The retrieval-
    side complement of :func:`bm25_scores` (which scores a given query
    against corpus stats; this materializes the index those lookups
    would serve) and the corpus-survey tool for lexicon pruning.

    ``max_df_frac`` makes the upper cap corpus-relative (df <= frac*N,
    the cap you'd actually ship at 100 TB — absolute caps don't
    survive corpus growth); N rides along as a broadcast 1-row cross
    join (the BM25 pattern), no driver-side collect.

    Scale design — df-prune BEFORE posting materialization: the term
    key is maximally skewed (stopwords appear in ~every doc), so
    building posting lists first and filtering second would
    materialize a corpus-sized list under a handful of hot keys. Here
    the (term, doc) pairs are distinct-ed, df is computed with
    map-side partial counts (one shuffle on term), terms outside
    [min_df, max_df] are dropped, and only surviving terms join back
    (term-keyed, co-partitioned with the groupBy that follows — one
    effective exchange) to build postings. ``max_df`` therefore bounds
    every posting list BY CONSTRUCTION; ``head`` caps the emitted
    column width on top. No windows, no Python.

    Returns (term, df, posting_head) — posting_head is the first
    ``head`` doc ids ascending, comma-joined (scalar column, stable
    across engines).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text)), "[^a-z0-9]+"), lambda t: t != ""
    )
    pairs = (
        df.select(F.col(id_col).alias("_doc"), F.explode(toks).alias("term"))
        .distinct()
    )
    dfc = pairs.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    if max_df_frac is not None:
        ncorp = pairs.select("_doc").distinct().agg(
            F.count(F.lit(1)).alias("_n")
        )
        dfc = dfc.crossJoin(F.broadcast(ncorp)).filter(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.lit(max_df_frac) * F.col("_n"))
        ).drop("_n")
    else:
        dfc = dfc.filter(
            (F.col("df") >= min_df) & (F.col("df") <= max_df)
        )
    return (
        pairs.join(dfc, "term")
        .groupBy("term", "df")
        .agg(F.array_sort(F.collect_list("_doc")).alias("_p"))
        .select(
            "term",
            "df",
            F.array_join(
                F.slice(
                    F.transform(F.col("_p"), lambda d: d.cast("string")),
                    1,
                    head,
                ),
                ",",
            ).alias("posting_head"),
        )
    )


def inverted_index_oracle_sql(
    src: str = "documents",
    min_df: int = 2,
    max_df: int = 10_000,
    head: int = 20,
    id_col: str = "doc_id",
    text: str = "text",
    max_df_frac: float | None = None,
) -> str:
    """DuckDB twin of :func:`inverted_index` (same alphanumeric-run
    tokens, distinct pairs, df window, sorted posting head)."""
    cap = (
        f"(select {max_df_frac} * count(distinct doc) from pairs)"
        if max_df_frac is not None
        else str(max_df)
    )
    return f"""
 with pairs as (
   select distinct {id_col} as doc, tok as term
   from (
     select {id_col},
            unnest(string_split_regex(lower({text}), '[^a-z0-9]+')) as tok
     from {src}
   ) where tok <> ''
 ),
 dfc as (
   select term, count(*)::BIGINT as df
   from pairs group by 1
   having count(*) >= {min_df} and count(*) <= {cap}
 ),
 posts as (
   select p.term, list_sort(list(p.doc)) as pl
   from pairs p join dfc using (term)
   group by 1
 )
 select dfc.term, dfc.df,
        array_to_string(list_transform(posts.pl[1:{head}], x -> x::VARCHAR),
                        ',') as posting_head
 from dfc join posts using (term)
"""


def pmi_collocations(
    docs: DataFrame,
    text: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Pointwise-mutual-information collocation mining (Church & Hanks
    1990) over adjacent lowercase ``[a-z]+`` tokens — the phrase-
    induction signal tokenizer/vocab builds and n-gram feature
    selection run over a corpus.

    pmi(w1, w2) = ln( p(w1 w2) / (p(w1) p(w2)) ) with p(pair) over the
    corpus pair total and p(w) over the token total. All counts are
    integer sums (bit-reproducible); the two probability totals ride
    along as a broadcast 1-row cross join, never a driver scalar.

    Shape at 100 TB: ONE corpus scan feeds both the pair and the
    unigram aggregation (vocab- and bigram-vocab-sized tables); the
    two enrichment joins are on single-word keys against vocab-sized
    build sides (AQE picks broadcast when they fit); ``min_count``
    prunes the bigram tail BEFORE the joins; top-k is a bounded heap
    (TakeOrderedAndProject), no global sort.

    Returns (w1, w2, n_pair, pmi[6dp]) for the top_k pairs by pmi
    (ties: w1, w2 ascending).
    """
    arr = F.expr(f"regexp_extract_all(lower({text}), '[a-z]+', 0)")
    toks = docs.select(arr.alias("arr"))
    pairs = (
        toks.select(
            F.explode(
                F.expr(
                    "zip_with(slice(arr, 1, size(arr) - 1),"
                    "         slice(arr, 2, size(arr) - 1),"
                    "         (l, r) -> struct(l as w1, r as w2))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= int(min_count))
    )
    uni = (
        toks.select(F.explode("arr").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    )
    totals = uni.agg(F.sum("n_w").cast("long").alias("n_tok"))
    # pair denominator = the min_count-surviving pair mass (same pruned
    # table the output rows come from; convention pinned by the oracle)
    n_pairs_total = pairs.agg(F.sum("n_pair").cast("long").alias("n_pr"))
    return (
        pairs.join(uni.withColumnRenamed("w", "w1")
                   .withColumnRenamed("n_w", "n_w1"), "w1")
        .join(uni.withColumnRenamed("w", "w2")
              .withColumnRenamed("n_w", "n_w2"), "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_pairs_total))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") * 1.0 / F.col("n_pr"))
                    / (
                        (F.col("n_w1") * 1.0 / F.col("n_tok"))
                        * (F.col("n_w2") * 1.0 / F.col("n_tok"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(int(top_k))
    )


def pmi_oracle_sql(
    src: str = "documents",
    text: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> str:
    """DuckDB twin of :func:`pmi_collocations` — identical token
    regex, integer counts, and double-division order before round(6).

    NOTE (denominator convention): the pair total is the sum of
    min_count-SURVIVING pair counts on both sides, so the constant is
    derived from the same pruned table the output rows come from.
    """
    return f"""
 with t as (select regexp_extract_all(lower({text}), '[a-z]+') as arr
            from {src}),
 pr as (select arr[i] as w1, arr[i + 1] as w2, count(*)::bigint as n_pair
        from (select arr, unnest(range(1, len(arr))) as i from t)
        group by 1, 2
        having count(*) >= {int(min_count)}),
 uni as (select w, count(*)::bigint as n_w
         from (select unnest(arr) as w from t) group by 1),
 tot as (select sum(n_w)::bigint as n_tok from uni),
 ptot as (select sum(n_pair)::bigint as n_pr from pr)
 select pr.w1, pr.w2, pr.n_pair,
        round(ln((pr.n_pair * 1.0 / ptot.n_pr)
                 / ((u1.n_w * 1.0 / tot.n_tok)
                    * (u2.n_w * 1.0 / tot.n_tok))), 6) as pmi
 from pr
 join uni u1 on pr.w1 = u1.w
 join uni u2 on pr.w2 = u2.w
 cross join tot cross join ptot
 order by pmi desc, pr.w1, pr.w2 limit {int(top_k)}"""


def zipf_stats(
    docs: DataFrame,
    text: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Corpus-health diagnostic: Zipf rank-frequency fit. Natural text
    follows freq ∝ rank^s with s ≈ −1; corpora polluted by boilerplate
    or templated spam bend the head of the curve, so the fitted slope
    is a cheap whole-corpus health number (alongside type/token mass).

    OLS of ln(freq) on ln(rank) over the ``top_n`` most frequent
    lowercase ``[a-z]+`` words (rank = row_number by freq desc, word
    asc — total order). Shape: ONE corpus scan → vocab-sized hash agg;
    the top-n cut is a bounded heap (TakeOrderedAndProject) and the
    rank window runs over exactly top_n rows (bounded by construction
    — this is the one place a single-partition window is correct).

    Returns one row: (n_types, n_tokens, top_n, zipf_slope,
    zipf_intercept), slope/intercept rounded to 6.
    """
    wf = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text}), '[a-z]+', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    totals = wf.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("freq").cast("long").alias("n_tokens"),
    )
    top = wf.orderBy(F.desc("freq"), F.asc("w")).limit(int(top_n))
    from pyspark.sql import Window

    ranked = top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("freq"), F.asc("w")))
        .alias("rank"),
        "freq",
    ).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    fit = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("slope"),
        "n",
        "sx",
        "sy",
    )
    fit = fit.select(
        F.round("slope", 6).alias("zipf_slope"),
        F.round(
            (F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n"), 6
        ).alias("zipf_intercept"),
    )
    return (
        totals.crossJoin(F.broadcast(fit))
        .select(
            "n_types",
            "n_tokens",
            F.lit(int(top_n)).alias("top_n"),
            "zipf_slope",
            "zipf_intercept",
        )
    )


def zipf_oracle_sql(
    src: str = "documents", text: str = "text", top_n: int = 100
) -> str:
    """DuckDB twin of :func:`zipf_stats` — identical rank order and
    OLS formula (same division structure before round(6))."""
    return f"""
 with wf as (
   select w, count(*)::bigint as freq
   from (select unnest(regexp_extract_all(lower({text}), '[a-z]+')) as w
         from {src})
   group by 1),
 totals as (select count(*)::bigint as n_types,
                   sum(freq)::bigint as n_tokens from wf),
 ranked as (
   select row_number() over (order by freq desc, w) as rank, freq
   from wf order by freq desc, w limit {int(top_n)}),
 pts as (select ln(rank::double) as x, ln(freq::double) as y from ranked),
 s as (select count(*)::double as n, sum(x) as sx, sum(y) as sy,
              sum(x * y) as sxy, sum(x * x) as sxx from pts),
 fit as (select (n * sxy - sx * sy) / (n * sxx - sx * sx) as slope,
                n, sx, sy from s)
 select totals.n_types, totals.n_tokens, {int(top_n)} as top_n,
        round(slope, 6) as zipf_slope,
        round((sy - slope * sx) / n, 6) as zipf_intercept
 from totals cross join fit"""


def corpus_drift(
    old: DataFrame,
    new: DataFrame,
    text: str = "text",
    top_k: int = 20,
    alpha: float = 0.5,
) -> DataFrame:
    """Distribution drift between two corpus slices (ingestion
    monitoring: did this wave's crawl change what the corpus is made
    of?): per-word Jensen-Shannon divergence contributions between the
    Laplace-smoothed unigram distributions, top-k drivers first.

    p_w = (c_w + α)/(N + αV) per side with V = |union vocabulary|, so
    words absent from one side stay defined; contribution =
    ½p·ln(p/m) + ½q·ln(q/m) with m = (p+q)/2 (summing it over the
    vocabulary gives the total JSD — the per-word rows are emitted
    instead because each is EXACT arithmetic on integer counts, no
    cross-row float accumulation for the driver hash to wobble on).

    Shape: one scan + vocab hash agg per side, ONE full-outer join on
    the word, totals as broadcast 1-row cross joins, bounded-heap
    top-k. Returns (w, n_old, n_new, p_old[8dp], p_new[8dp],
    contrib[9dp]).
    """
    def counts(df, name):
        return (
            df.select(
                F.explode(
                    F.expr(f"regexp_extract_all(lower({text}), '[a-z]+', 0)")
                ).alias("w")
            )
            .groupBy("w")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    co = counts(old, "n_old")
    cn = counts(new, "n_new")
    j = co.join(cn, "w", "full_outer").select(
        "w",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    tot = j.agg(
        F.sum("n_old").cast("long").alias("_no"),
        F.sum("n_new").cast("long").alias("_nn"),
        F.count(F.lit(1)).cast("long").alias("_v"),
    )
    a = F.lit(float(alpha))
    p = (F.col("n_old") + a) / (F.col("_no") + a * F.col("_v"))
    q = (F.col("n_new") + a) / (F.col("_nn") + a * F.col("_v"))
    m = (p + q) / 2
    contrib = F.lit(0.5) * p * F.log(p / m) + F.lit(0.5) * q * F.log(q / m)
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            "w",
            "n_old",
            "n_new",
            F.round(p, 8).alias("p_old"),
            F.round(q, 8).alias("p_new"),
            F.round(contrib, 9).alias("contrib"),
        )
        .orderBy(F.desc("contrib"), F.asc("w"))
        .limit(int(top_k))
    )


def corpus_drift_oracle_sql(
    old_cte: str,
    new_cte: str,
    text: str = "text",
    top_k: int = 20,
    alpha: float = 0.5,
) -> str:
    """DuckDB twin of :func:`corpus_drift`; the CTEs must define
    ``old_docs(text)`` and ``new_docs(text)``."""
    a = f"cast({float(alpha)!r} as double)"
    return f"""
 with {old_cte},
 {new_cte},
 co as (select w, count(*)::bigint as n_old
        from (select unnest(regexp_extract_all(lower({text}), '[a-z]+')) w
              from old_docs) group by 1),
 cn as (select w, count(*)::bigint as n_new
        from (select unnest(regexp_extract_all(lower({text}), '[a-z]+')) w
              from new_docs) group by 1),
 j as (select coalesce(co.w, cn.w) as w,
              coalesce(n_old, 0) as n_old, coalesce(n_new, 0) as n_new
       from co full outer join cn on co.w = cn.w),
 tot as (select sum(n_old)::bigint as no, sum(n_new)::bigint as nn,
                count(*)::bigint as v from j),
 e as (
   select w, n_old, n_new,
          (n_old + {a}) / (no + {a} * v) as p,
          (n_new + {a}) / (nn + {a} * v) as q
   from j cross join tot
 )
 select w, n_old, n_new,
        round(p, 8) as p_old, round(q, 8) as p_new,
        round(0.5 * p * ln(p / ((p + q) / 2))
              + 0.5 * q * ln(q / ((p + q) / 2)), 9) as contrib
 from e
 order by contrib desc, w limit {int(top_k)}"""


def heaps_stats(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-health diagnostic #2: Heaps'-law vocabulary growth —
    V(N) ≈ K·N^β with β ≈ 0.4-0.6 for natural text. A corpus whose β
    collapses (template spam: vocabulary saturates) or approaches 1
    (ID/hash pollution: every token novel) fails curation upstream of
    any model; this is the growth-curve complement of
    :func:`zipf_stats`' rank-frequency fit.

    One checkpoint per document in ``id_col`` order: N_i = running
    token count, V_i = running distinct-word count (a word counts at
    its FIRST document, via min-doc per word — one vocab-sized agg).
    Running sums use the two-level cumsum engine shared with
    pack_shards — the checkpoint table is doc-count-sized, which at
    10^10 docs is itself too big for a single-partition window. OLS
    of ln V on ln N over all checkpoints, same fixed formula as the
    Zipf fit; the intercept is reported as ln K (no libm exp(), so
    both engines agree to the 6dp rounding).

    Returns one row: (n_points, n_tokens, n_types, heaps_beta,
    heaps_ln_k), floats rounded to 6.
    """
    from .curate import _exclusive_stratum_cumsum

    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text}), '[a-z]+', 0)")
        ).alias("w"),
    )
    per_doc = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nt"))
    first = toks.groupBy("w").agg(F.min(id_col).alias(id_col))
    new_per_doc = first.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nv"))
    base = (
        per_doc.join(new_per_doc, id_col, "left")
        .select(
            id_col,
            F.lit(0).alias("_one"),
            F.col("_nt"),
            F.coalesce(F.col("_nv"), F.lit(0)).alias("_nv"),
        )
        .localCheckpoint(eager=True)  # feeds two cumsums + totals
    )
    cum_t = _exclusive_stratum_cumsum(base, "_one", id_col, "_nt", 20).select(
        id_col, (F.col("_cum") + F.col("_t")).alias("_N")
    )
    cum_v = _exclusive_stratum_cumsum(base, "_one", id_col, "_nv", 20).select(
        id_col, (F.col("_cum") + F.col("_t")).alias("_V")
    )
    pts = (
        cum_t.join(cum_v, id_col)
        .filter((F.col("_N") > 0) & (F.col("_V") > 0))
        .select(
            F.log(F.col("_N").cast("double")).alias("x"),
            F.log(F.col("_V").cast("double")).alias("y"),
        )
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("beta"),
        "n",
        "sx",
        "sy",
    )
    fit = s.select(
        F.col("n").cast("long").alias("n_points"),
        F.round("beta", 6).alias("heaps_beta"),
        F.round(
            (F.col("sy") - F.col("beta") * F.col("sx")) / F.col("n"), 6
        ).alias("heaps_ln_k"),
    )
    totals = base.agg(
        F.sum("_nt").cast("long").alias("n_tokens"),
        F.sum("_nv").cast("long").alias("n_types"),
    )
    return totals.crossJoin(F.broadcast(fit)).select(
        "n_points", "n_tokens", "n_types", "heaps_beta", "heaps_ln_k"
    )


def heaps_oracle_sql(src: str = "documents", text: str = "text") -> str:
    """DuckDB twin of :func:`heaps_stats` — identical checkpoint set,
    running sums, and OLS formula (division structure matches before
    the 6dp round)."""
    return f"""
 with toks as (
   select doc_id, unnest(regexp_extract_all(lower({text}), '[a-z]+')) as w
   from {src}),
 per_doc as (select doc_id, count(*) as nt from toks group by 1),
 first as (select w, min(doc_id) as doc_id from toks group by 1),
 newpd as (select doc_id, count(*) as nv from first group by 1),
 base as (
   select p.doc_id, p.nt, coalesce(n.nv, 0) as nv
   from per_doc p left join newpd n on p.doc_id = n.doc_id),
 cums as (
   select doc_id,
     sum(nt) over (order by doc_id rows between unbounded preceding
                   and current row) as N,
     sum(nv) over (order by doc_id rows between unbounded preceding
                   and current row) as V
   from base),
 pts as (select ln(N::double) as x, ln(V::double) as y
         from cums where N > 0 and V > 0),
 s as (select count(*)::double as n, sum(x) as sx, sum(y) as sy,
              sum(x * y) as sxy, sum(x * x) as sxx from pts),
 fit as (select (n * sxy - sx * sy) / (n * sxx - sx * sx) as beta,
                n, sx, sy from s),
 totals as (select sum(nt)::bigint as n_tokens,
                   sum(nv)::bigint as n_types from base)
 select fit.n::bigint as n_points, totals.n_tokens, totals.n_types,
        round(beta, 6) as heaps_beta,
        round((sy - beta * sx) / n, 6) as heaps_ln_k
 from totals cross join fit"""
