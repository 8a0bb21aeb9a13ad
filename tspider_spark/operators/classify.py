"""Model-based quality classification: fastText-style linear scoring
over hashed word n-gram features.

The standard LLM-curation quality gate (GPT-3's WebText-vs-Common-Crawl
logistic regression, CCNet/fastText language+quality classifiers,
LLaMA's "reference-like" filter) is a LINEAR model over hashed bag-of-
n-gram features: tokens and word bigrams are feature-hashed into a
fixed bucket space and the document score is a weighted sum of bucket
counts pushed through a sigmoid.  This module implements the SCORING
side of that pipeline Spark-first:

- ``hashed_gram_features``: one scan, one explode — unigrams and word
  bigrams hashed into ``n_buckets`` with the same portable md5 idiom as
  MinHash/simhash (`conv(substring(md5(g),1,15),16,10)`), so the whole
  path stays DuckDB-oracle-checkable.  No vocabulary table: the
  hashing trick (Weinberger et al. 2009) makes the feature space fixed
  and collision-tolerant, exactly like fastText's ``-hash`` buckets.
- ``linear_quality_scores``: features ⋈ broadcast(weights) on the
  bucket id, then ONE map-side-combinable aggregation per document.
  The model is a *table* (bucket, weight), the way a trained fastText /
  sklearn export lands in a warehouse — at 100 TB the weights (4k-2M
  rows) broadcast to every executor and the corpus side is a single
  projected scan; per-doc state is two running sums.  Documents with
  no grams at all (empty/whitespace text) produce no output row — the
  explode drops them on both the Spark and the oracle side, so the
  contract stays aligned.
- ``md5_stub_weights``: a deterministic stand-in for the trained
  weight vector (hash of the bucket id mapped to [-1, 1]) so tests and
  the driver contract exercise the full scoring path without shipping
  a model; a real deployment replaces this one table.

Reference parity: TSpider has no model gate (its filters are the F1-F14
rule chain); this extends the curation layer alongside gopher_filter /
c4_line_filter as the learned-filter slot of a training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _grams_from_tokens(toks_col: str) -> "F.Column":
    """Unigrams + word bigrams as one array, over an ALREADY-BOUND
    token-array column (binding matters: a split macro inlined into
    the transform lambda is NOT subexpression-eliminated by codegen,
    so it would re-split the text once per element_at — O(tokens^2)
    per doc). Bigrams join with '_' (fastText's word-ngram
    convention); ``sequence(1, n-1)`` is guarded because Spark's
    sequence(1, 0) counts DOWN, so sub-two-token docs must take the
    empty branch explicitly."""
    return F.expr(
        f"concat({toks_col}, "
        f"case when size({toks_col}) >= 2 then "
        f"transform(sequence(1, size({toks_col}) - 1), "
        f"i -> concat(element_at({toks_col}, i), '_', "
        f"element_at({toks_col}, i + 1))) "
        f"else array() end)"
    )


def hashed_gram_features(
    df: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, bucket, cnt) hashed n-gram counts — one scan, one explode,
    one map-side-combinable count agg keyed on (id, bucket).  Bucket
    cardinality per doc is min(n_grams, n_buckets), so the aggregation
    state is bounded; no shuffle before the (id, bucket) exchange.

    hash_fn follows the MinHash convention: "md5" is the portable
    (DuckDB-oracle-checkable) bucket hash; "xxhash64" is the JVM-native
    scale path (~10x cheaper per gram) — legal whenever the weight
    table was trained/exported against the same hash, which is the
    production case (the hash is part of the model artifact)."""
    # Bind the token array to a COLUMN before building bigrams: the
    # split/lower/trim subtree inside _grams' transform lambda is NOT
    # subexpression-eliminated by codegen, so inlining it re-splits
    # the text once per element_at — O(tokens^2) per doc (measured
    # ~2x the whole training loop at sf0.1). Two selects = one split.
    toksed = df.select(
        F.col(id_col),
        F.expr(
            f"filter(split(trim(lower({text})), '\\\\s+'), w -> w <> '')"
        ).alias("_toks"),
    )
    grams = toksed.select(
        F.col(id_col), F.explode(_grams_from_tokens("_toks")).alias("_g")
    )
    if hash_fn == "xxhash64":
        h = F.shiftrightunsigned(F.xxhash64("_g"), 1)
    else:
        h = F.conv(F.substring(F.md5("_g"), 1, 15), 16, 10).cast("long")
    return (
        grams.select(
            F.col(id_col), F.pmod(h, F.lit(n_buckets)).cast("int").alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def md5_stub_weights(
    spark: SparkSession, n_buckets: int = 4096, seed: str = "qcw"
) -> DataFrame:
    """Deterministic stand-in weight table (bucket, weight) with
    weight in [-1, 1] derived from md5(seed-bucket) — the sandbox
    substitute for a trained fastText/logistic export.  Generated
    distributed (spark.range), tiny (n_buckets rows), broadcast at the
    scoring join."""
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + "-"), F.col("id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        ((hv % 2000001 - 1000000) / 1000000.0).alias("weight"),
    )


def linear_quality_scores(
    df: DataFrame,
    weights: DataFrame,
    n_buckets: int = 4096,
    bias: float = 0.0,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Score every document with a linear model over hashed n-gram
    features: score = bias + Σ w(bucket(g))·cnt(g) / Σ cnt(g),
    prob = sigmoid(score), keep = prob ≥ threshold.

    Plan: feature explode → (id, bucket) partial-agg → BROADCAST join
    with the weight table (the model is always tiny next to the
    corpus) → one final per-doc agg.  Length normalization (divide by
    the gram count) is fastText's mean-of-embeddings analog and keeps
    long documents from saturating the sigmoid.  Docs whose every gram
    hashes to an unweighted bucket (left join) score exactly ``bias``.

    Output: (id_col, n_grams, score, prob, keep) — scalar columns only
    (driver-contract rule).
    """
    feats = hashed_gram_features(
        df, n_buckets, id_col=id_col, text=text, hash_fn=hash_fn
    )
    scored = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            (
                F.lit(bias)
                + F.sum(F.coalesce(F.col("weight"), F.lit(0.0)) * F.col("cnt"))
                / F.sum("cnt")
            ).alias("score"),
        )
    )
    prob = F.round(1.0 / (1.0 + F.exp(-F.col("score"))), 6)
    return scored.select(
        F.col(id_col),
        "n_grams",
        F.round("score", 6).alias("score"),
        prob.alias("prob"),
        (prob >= F.lit(threshold)).alias("keep"),
    )


def train_quality_classifier(
    feats: DataFrame,
    labels: DataFrame,
    iters: int = 3,
    lr: float = 0.5,
    id_col: str = "doc_id",
    checkpoint_every: int = 1,
) -> DataFrame:
    """Distributed full-batch logistic-regression training over hashed
    n-gram features — the TRAINING stage of the fastText-style quality
    classifier (CCNet / LLaMA pipelines train exactly this shape:
    linear model over hashed grams, labels = "looks like the target
    corpus"); :func:`linear_quality_scores` is its inference twin.

    ``feats`` is (id, bucket, cnt) from :func:`hashed_gram_features`;
    ``labels`` is (id, y) with y in {0.0, 1.0}.

    Determinism-by-construction (the DuckDB oracle must replay the
    trajectory bit-for-bit): every cross-row aggregate — the per-doc
    margin and the per-bucket gradient — is rounded to 1e-7 BEFORE it
    feeds the next step. Double addition is non-associative, so
    partition-order-dependent sums drift in the last ulps (~1e-15
    relative); rounding at 1e-7 absorbs that drift each iteration
    instead of letting gradient descent amplify it chaotically. lr
    must be exactly representable (0.5 is); weight updates then add
    identically on both engines.

    Scale shape per iteration — exactly two shuffles, both
    map-side-combinable aggs: margins groupBy(id) after the
    bucket-keyed weight join (weights ≤ n_buckets rows, broadcast),
    and gradient groupBy(bucket) after the id-keyed residual join
    (labels co-keyed with feats on id). n_docs rides as a broadcast
    1-row agg. Lineage is cut per iteration (the weight plan would
    otherwise grow ~4^k like PageRank's).

    Returns (bucket, weight) for every bucket present in ``feats``;
    weight is emitted exactly as trained — NOT re-rounded, because the
    trained values sit on (halves of) the 1e-7 gradient grid and
    re-rounding them coarser manufactures decimal .5 TIES that HALF_UP
    BigDecimal (Spark) and multiply-rint (DuckDB) break differently.
    """
    if iters < 1:
        raise ValueError("train_quality_classifier needs iters >= 1")
    # Materialize the feature matrix ONCE: f feeds two joins per
    # iteration (margins, gradient), so an un-cached plan recomputes
    # the gram explode + md5 hashing 2×iters times — at sf0.1 that is
    # the whole training cost. localCheckpoint (not cache) also cuts
    # the lineage so the per-iteration plans stay flat.
    f = feats.select(
        F.col(id_col).alias("_id"),
        F.col("bucket"),
        F.col("cnt").cast("double").alias("_x"),
    ).localCheckpoint(eager=True)
    y = labels.select(
        F.col(id_col).alias("_id"), F.col("y").cast("double")
    ).localCheckpoint(eager=True)
    nd = y.agg(F.count(F.lit(1)).cast("double").alias("_nd"))
    w = f.select("bucket").distinct().select(
        "bucket", F.lit(0.0).alias("_w")
    )
    for i in range(iters):
        margins = (
            f.join(F.broadcast(w), "bucket")
            .groupBy("_id")
            .agg(F.round(F.sum(F.col("_x") * F.col("_w")), 7).alias("_m"))
        )
        # resid is rounded to a 1e-9 grid: exp() is NOT guaranteed
        # correctly rounded, so JVM libm and DuckDB libm can disagree
        # in the last ulp at the same margin — rounding the sigmoid
        # output makes every gradient ADDEND bit-identical across
        # engines, leaving only association-order drift (~1e-15) for
        # the 1e-7 gradient rounding to absorb
        resid = margins.join(y, "_id").select(
            "_id",
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m"))) - F.col("y"),
                9,
            ).alias("_r"),
        )
        grad = (
            f.join(resid, "_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("_x") * F.col("_r")).alias("_gs"))
            .crossJoin(F.broadcast(nd))
            .select(
                "bucket", F.round(F.col("_gs") / F.col("_nd"), 7).alias("_g")
            )
        )
        # the update itself is NOT rounded: both engines hold the same
        # two doubles (w on the previous grid, g on the 1e-7 grid) and
        # IEEE multiply+subtract is exactly determined — whereas
        # rounding the update at 1e-7 would land EXACTLY on .5e-7
        # decimal ties half the time (lr=0.5 halves the grid), and
        # Spark's BigDecimal HALF_UP and DuckDB's multiply-rint break
        # those ties differently (observed: 1e-7 weight divergence)
        w = w.join(grad, "bucket").select(
            "bucket",
            (F.col("_w") - F.lit(lr) * F.col("_g")).alias("_w"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            w = w.localCheckpoint(eager=True)
    return w.select("bucket", F.col("_w").alias("weight"))


def train_oracle_sql(
    feats_cte: str,
    labels_cte: str,
    iters: int = 3,
    lr: float = 0.5,
) -> str:
    """Chained-CTE DuckDB twin of :func:`train_quality_classifier`.
    ``feats_cte`` must define ``feats(doc, bucket, cnt)`` and
    ``labels_cte`` must define ``labels(doc, y)``; the same 1e-7
    fixed-point rounding keeps the trajectories identical."""
    parts = [
        feats_cte,
        labels_cte,
        "nd as (select count(*)::DOUBLE as n from labels)",
        "w0 as materialized (select distinct bucket, 0.0 as w from feats)",
    ]
    for t in range(iters):
        parts.append(
            f"m{t} as (select f.doc, round(sum(f.cnt * w.w), 7) as m "
            f"from feats f join w{t} w using (bucket) group by 1)"
        )
        parts.append(
            f"r{t} as (select m.doc, "
            f"round(1.0 / (1.0 + exp(-m.m)) - l.y, 9) as r "
            f"from m{t} m join labels l using (doc))"
        )
        parts.append(
            f"g{t} as (select f.bucket, "
            f"round(sum(f.cnt * r.r) / (select n from nd), 7) as g "
            f"from feats f join r{t} r using (doc) group by 1)"
        )
        parts.append(
            f"w{t + 1} as materialized (select w.bucket, "
            f"w.w - {lr} * g.g as w "
            f"from w{t} w join g{t} g using (bucket))"
        )
    return (
        "with " + ",\n ".join(parts)
        + f"\n select bucket, w as weight from w{iters}"
    )


def classifier_pr_curve(
    feats: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    thresholds: tuple[float, ...] = (0.3, 0.4, 0.5, 0.6, 0.7),
    id_col: str = "doc_id",
) -> DataFrame:
    """Precision/recall sweep of a (trained) linear quality classifier
    — the threshold-selection step between :func:`train_quality_classifier`
    and deploying the keep/drop gate (pipelines pick the operating
    point from exactly this table, e.g. "keep the top X% most
    wiki-like"; cf. CCNet's quality buckets).

    One pass: margins (broadcast weight join + id-keyed agg, the same
    two-shuffle shape as one training iteration), sigmoid rounded to
    the 1e-9 grid (same cross-libm guard as training), then the
    threshold list EXPLODES from a literal array (|thresholds| ~ 10 —
    a constant fan-out, NOT a corpus re-scan per threshold) into one
    map-side-combinable confusion agg.

    precision/recall are emitted as RAW doubles: both engines divide
    identical integer counts, and IEEE division is exactly determined
    — rounding could only manufacture ties.

    Returns (threshold, tp, fp, fn, tn, precision, recall) — one row
    per threshold; precision is NULL at thresholds where nothing is
    predicted positive.
    """
    margins = (
        feats.select(
            F.col(id_col).alias("_id"),
            "bucket",
            F.col("cnt").cast("double").alias("_x"),
        )
        .join(F.broadcast(weights), "bucket")
        .groupBy("_id")
        .agg(
            F.round(F.sum(F.col("_x") * F.col("weight")), 7).alias("_m")
        )
    )
    scored = margins.join(
        labels.select(F.col(id_col).alias("_id"), F.col("y").cast("double")),
        "_id",
    ).select(
        "y",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m"))), 9).alias(
            "_p"
        ),
    )
    th = F.explode(
        F.array(*[F.lit(float(t)) for t in thresholds])
    ).alias("threshold")
    fanned = scored.select("y", "_p", th)
    pred = F.col("_p") >= F.col("threshold")
    pos = F.col("y") == 1.0
    agg = fanned.groupBy("threshold").agg(
        F.sum(F.when(pred & pos, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(pred & ~pos, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~pred & pos, 1).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~pred & ~pos, 1).otherwise(0)).cast("long").alias("tn"),
    )
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        (F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0))).alias(
            "precision"
        ),
        (F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0))).alias(
            "recall"
        ),
    )


def pr_curve_oracle_sql(
    train_sql: str,
    feats_cte: str,
    labels_cte: str,
    thresholds: tuple[float, ...] = (0.3, 0.4, 0.5, 0.6, 0.7),
) -> str:
    """DuckDB twin of :func:`classifier_pr_curve` over the weights
    produced by ``train_sql`` (a full SELECT, nested as a subquery —
    DuckDB allows WITH inside derived tables)."""
    tl = ", ".join(f"({float(t)})" for t in thresholds)
    return f"""
 with {feats_cte},
 {labels_cte},
 w as (select * from ({train_sql})),
 m as (
   select f.doc, round(sum(f.cnt * w.weight), 7) as m
   from feats f join w on f.bucket = w.bucket group by 1
 ),
 s as (
   select l.y, round(1.0 / (1.0 + exp(-m.m)), 9) as p
   from m join labels l using (doc)
 ),
 th(threshold) as (values {tl}),
 c as (
   select th.threshold,
          sum(case when s.p >= th.threshold and s.y = 1.0 then 1 else 0 end)::BIGINT as tp,
          sum(case when s.p >= th.threshold and s.y <> 1.0 then 1 else 0 end)::BIGINT as fp,
          sum(case when s.p < th.threshold and s.y = 1.0 then 1 else 0 end)::BIGINT as fn,
          sum(case when s.p < th.threshold and s.y <> 1.0 then 1 else 0 end)::BIGINT as tn
   from s cross join th group by 1
 )
 select threshold, tp, fp, fn, tn,
        tp / nullif(tp + fp, 0) as precision,
        tp / nullif(tp + fn, 0) as recall
 from c
"""


def classifier_calibration(
    feats: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    bins: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reliability diagram of a (trained) linear quality classifier:
    uniform probability bins with per-bin count, positive count, mean
    predicted probability, and empirical positive rate. A classifier
    whose gate threshold means anything needs frac_pos ≈ mean_p per
    bin; drift between them is what temperature-scaling would fix —
    and what silently mis-sizes a "keep the top X%" curation gate.

    Same two-shuffle margin pass as :func:`classifier_pr_curve`, then
    ONE map-side-combinable agg keyed by the bin index (≤ ``bins``
    groups). frac_pos is a raw IEEE division of identical integer
    counts; mean_p is a double mean rounded to 6 (same precedent as
    the PageRank family).

    Returns (bin, p_lo, p_hi, n, n_pos, mean_p, frac_pos), only bins
    that contain at least one document.
    """
    margins = (
        feats.select(
            F.col(id_col).alias("_id"),
            "bucket",
            F.col("cnt").cast("double").alias("_x"),
        )
        .join(F.broadcast(weights), "bucket")
        .groupBy("_id")
        .agg(F.round(F.sum(F.col("_x") * F.col("weight")), 7).alias("_m"))
    )
    scored = margins.join(
        labels.select(F.col(id_col).alias("_id"), F.col("y").cast("double")),
        "_id",
    ).select(
        "y",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m"))), 9).alias(
            "_p"
        ),
    )
    # long, not int: DuckDB's least(floor()::int, k) still yields
    # BIGINT, and the driver hash compares dtypes strictly
    bin_ix = F.least(
        F.floor(F.col("_p") * bins).cast("long"), F.lit(bins - 1).cast("long")
    )
    agg = (
        scored.select(bin_ix.alias("bin"), "y", "_p")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.round(F.avg("_p"), 6).alias("mean_p"),
        )
    )
    return agg.select(
        "bin",
        F.round(F.col("bin") * (1.0 / bins), 6).alias("p_lo"),
        F.round((F.col("bin") + 1) * (1.0 / bins), 6).alias("p_hi"),
        "n",
        "n_pos",
        "mean_p",
        (F.col("n_pos") / F.col("n")).alias("frac_pos"),
    )


def calibration_oracle_sql(
    train_sql: str,
    feats_cte: str,
    labels_cte: str,
    bins: int = 10,
) -> str:
    """DuckDB twin of :func:`classifier_calibration` over the weights
    produced by ``train_sql``."""
    return f"""
 with {feats_cte},
 {labels_cte},
 w as (select * from ({train_sql})),
 m as (
   select f.doc, round(sum(f.cnt * w.weight), 7) as m
   from feats f join w on f.bucket = w.bucket group by 1
 ),
 s as (
   select l.y, round(1.0 / (1.0 + exp(-m.m)), 9) as p
   from m join labels l using (doc)
 ),
 c as (
   select least(floor(p * {bins})::int, {bins - 1}) as bin,
          count(*)::BIGINT as n,
          sum(case when y = 1.0 then 1 else 0 end)::BIGINT as n_pos,
          round(avg(p), 6) as mean_p
   from s group by 1
 )
 select bin, round(bin * cast({1.0 / bins!r} as double), 6) as p_lo,
        round((bin + 1) * cast({1.0 / bins!r} as double), 6) as p_hi,
        n, n_pos, mean_p,
        n_pos / n as frac_pos
 from c
"""
