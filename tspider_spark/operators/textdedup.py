"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, and n-gram Jaccard — all over the ``documents``
table shape (doc_id, text).

Scale design: every pairwise step goes through a bucket equi-join
(shingle, LSH band, or simhash chunk) — never a cross join. The
verify step re-checks candidates exactly, so bucketing parameters
trade recall for cost but can never introduce false positives.

Hash portability: MinHash permutation hashes are derived from
``md5`` hex (bigint of the first 15 hex chars), which DuckDB can
reproduce exactly (``('0x' || substring(md5(s),1,15))::BIGINT``) —
so the whole MinHash pipeline is oracle-checkable, not just the
final pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tspider_spark.operators.textstats import (
    SIMHASH_BITS,
    doc_fingerprint,
    simhash_signatures,
)

# ---------------------------------------------------------------------------
# exact dedupe


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Hash-groupBy exact dedupe: one row per duplicated content with
    the keeper (min id) and group size."""
    return (
        df.select(F.col(id_col), doc_fingerprint(text).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
    )


def dedupe_exact(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Keep the min-id doc per distinct normalized content."""
    w = Window.partitionBy(doc_fingerprint(text)).orderBy(id_col)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# shingles + exact jaccard (the verification primitive)


def shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per doc — pure JVM (split +
    sequence + transform), exploded."""
    words = f"split(trim(lower({text})), '\\\\s+')"
    # NB: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty — docs
    # shorter than n words must short-circuit to an empty array.
    # The token array is BOUND to a column first: codegen does not
    # subexpression-eliminate inside transform lambdas, so inlining
    # the split re-splits the text once per slice() — O(words^2).
    grams = F.expr(
        f"case when size(_w) >= {n} then "
        f"transform(sequence(1, size(_w) - {n} + 1), "
        f"i -> concat_ws(' ', slice(_w, i, {n}))) "
        f"else array() end"
    )
    return (
        df.select(F.col(id_col), F.expr(words).alias("_w"))
        .select(F.col(id_col), F.explode(grams).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(sh: DataFrame, tau: float, id_col: str = "doc_id") -> DataFrame:
    """Exact word-shingle Jaccard >= tau for every pair sharing >=1
    shingle. ``sh`` = output of :func:`shingles`. Shuffles by shingle
    (skew note: a stopword-only shingle can be hot; n>=3 shingles keep
    fan-out tame) then by pair."""
    a = sh.select(F.col(id_col).alias("ia"), "shingle")
    b = sh.select(F.col(id_col).alias("ib"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    return (
        inter.join(sizes.withColumnRenamed(id_col, "ia").withColumnRenamed("sz", "sza"), "ia")
        .join(sizes.withColumnRenamed(id_col, "ib").withColumnRenamed("sz", "szb"), "ib")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= tau)
        .select("ia", "ib", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_dups(
    df: DataFrame, n: int = 3, tau: float = 0.8, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Direct n-gram Jaccard dedupe (the brute-ish baseline; the scale
    path is minhash_lsh_dups which prefilters candidate pairs)."""
    return jaccard_pairs(shingles(df, n, id_col, text), tau, id_col)


def containment_pairs(
    df: DataFrame,
    n: int = 3,
    tau: float = 0.9,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT C(A→B) = |S(A) ∩ S(B)| / |S(A)|
    (Broder 1997's companion measure to resemblance): flags documents
    mostly QUOTED/EMBEDDED inside other documents — a small doc pasted
    into a large aggregator page scores containment ≈ 1 while its
    symmetric Jaccard collapses toward |A|/|B| and slips under any
    dedupe threshold. Standard curation use: drop the contained copy,
    keep the superset page (or vice versa for boilerplate wrappers).

    Output: DIRECTED pairs (ia, ib, containment) with ia ≠ ib and
    C(ia→ib) >= tau, rounded to 6. Scale shape = :func:`jaccard_pairs`:
    one shuffle by shingle (n >= 3 keeps hot-shingle fan-out tame, and
    the MinHash-LSH prefilter composes in front exactly as for Jaccard
    when the corpus is too big for the direct join), one by pair."""
    sh = shingles(df, n, id_col, text)
    a = sh.select(F.col(id_col).alias("ia"), "shingle")
    b = sh.select(F.col(id_col).alias("ib"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("ia") != F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    return (
        inter.join(
            sizes.withColumnRenamed(id_col, "ia").withColumnRenamed("sz", "sza"),
            "ia",
        )
        .withColumn("containment", F.col("inter") / F.col("sza"))
        .filter(F.col("containment") >= tau)
        .select("ia", "ib", F.round("containment", 6).alias("containment"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def _portable_hash64(col, salt: int):
    """Deterministic 60-bit int hash reproducible in DuckDB:
    conv(substring(md5(salt || ':' || s), 1, 15), 16, 10)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, 15), 16, 10
    ).cast("long")


def _hash64(col, salt: int, hash_fn: str):
    """Per-permutation shingle hash. "md5": DuckDB-portable (the
    oracle-checked path). "xxhash64": JVM-native, ~10x cheaper — the
    scale path; legal because the exact-Jaccard verify step makes the
    output independent of the hash choice (only recall depends on it,
    and both are uniform 64-bit families)."""
    if hash_fn == "xxhash64":
        return F.xxhash64(F.lit(salt), col)
    return _portable_hash64(col, salt)


def minhash_signatures(
    sh: DataFrame, k: int = 32, id_col: str = "doc_id", hash_fn: str = "md5"
) -> DataFrame:
    """k-permutation MinHash signature per doc: k column-wise min
    aggregations over the shingle set (map-side combinable)."""
    hashed = sh.select(
        id_col,
        *[_hash64(F.col("shingle"), j, hash_fn).alias(f"h{j}") for j in range(k)],
    )
    return hashed.groupBy(id_col).agg(
        F.array(*[F.min(f"h{j}") for j in range(k)]).alias("sig")
    )


def band_buckets(
    sigs: DataFrame, bands: int = 16, rows: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """(id, band, bucket) rows — the LSH band index. This is the
    PERSISTABLE artifact: a corpus's band index is written once
    (bucketed by (band, bucket) at scale) and reused by
    :func:`incremental_lsh_dups` every ingest wave, so signature work
    is never repeated for already-indexed documents."""
    return sigs.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "_", *[F.col("sig")[b * rows + r] for r in range(rows)]
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 16, rows: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signature (bands x rows == len(sig)); docs sharing a
    full band land in the same bucket -> candidate pair."""
    banded = band_buckets(sigs, bands, rows, id_col)
    a = banded.select(F.col(id_col).alias("ia"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("ib"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib")
        .distinct()
    )


def minhash_lsh_dups(
    df: DataFrame,
    n: int = 3,
    tau: float = 0.8,
    k: int = 32,
    bands: int = 16,
    rows: int = 2,
    id_col: str = "doc_id",
    text: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """The scale path: shingle -> minhash -> band-bucket join ->
    exact-Jaccard verification of candidates only. With bands=16,
    rows=2 the probability of missing a tau=0.8 pair is
    (1 - 0.8^2)^16 ≈ 5e-8 per pair; the verify step guarantees zero
    false positives."""
    sh = shingles(df, n, id_col, text)
    sh.cache()
    cand = lsh_candidate_pairs(
        minhash_signatures(sh, k, id_col, hash_fn), bands, rows, id_col
    ).cache()
    # THE point of LSH: the expensive shingle-shingle join runs only
    # over docs that appear in at least one candidate pair. The
    # semi-join keeps each surviving doc's FULL shingle set, so the
    # per-doc sizes (hence Jaccard) stay exact; the final semi-join
    # narrows candidate-doc x candidate-doc pairs down to the actual
    # LSH pairs. Without this restriction the verify step costs as
    # much as the brute n-gram path it exists to avoid.
    cand_docs = cand.select(
        F.explode(F.array("ia", "ib")).alias(id_col)
    ).distinct()
    sh_cand = sh.join(cand_docs, id_col, "left_semi")
    exact = jaccard_pairs(sh_cand, tau, id_col)
    out = exact.join(cand, ["ia", "ib"], "left_semi")
    return out


def incremental_lsh_dups(
    old_docs: DataFrame,
    new_docs: DataFrame,
    n: int = 3,
    tau: float = 0.8,
    k: int = 32,
    bands: int = 16,
    rows: int = 2,
    id_col: str = "doc_id",
    text: str = "text",
    hash_fn: str = "md5",
    old_buckets: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs involving at least one NEW document — the
    per-wave dedupe path of a continuously-ingesting corpus.

    Rerunning :func:`minhash_lsh_dups` over old ∪ new every wave
    recomputes shingles + signatures for the WHOLE corpus — O(corpus)
    per wave, the dedupe analog of the unbucketed fetch join. This
    operator makes the per-wave cost wave-proportional instead:

    - signatures/banding run over ``new_docs`` only (one scan of the
      wave);
    - the old corpus participates through its PERSISTED band index
      (``old_buckets``, built once via :func:`band_buckets`; pass
      None to recompute it, which tests and the oracle do) — at
      10^10-doc scale that table is bucketed by (band, bucket) so the
      new-side probe is a storage-partitioned join, old-old pairs are
      never even generated;
    - exact-Jaccard verification is candidate-bounded on BOTH sides:
      old documents' shingles are recomputed only for docs that
      collide with a new band bucket (a semi-joined point scan of the
      corpus, O(candidates)).

    Output: (ia, ib, jaccard) with ia < ib, jaccard >= tau, and at
    least one side from ``new_docs``; new×new pairs are included, so
    old_dups(old) ∪ incremental(old, new) == full_dups(old ∪ new) —
    the wave-invariant a resumable ingest pipeline needs. ``id_col``
    values must be unique across old ∪ new.
    """
    new_sh = shingles(new_docs, n, id_col, text).cache()
    new_bk = band_buckets(
        minhash_signatures(new_sh, k, id_col, hash_fn), bands, rows, id_col
    ).cache()
    if old_buckets is None:
        old_buckets = band_buckets(
            minhash_signatures(shingles(old_docs, n, id_col, text), k,
                               id_col, hash_fn),
            bands, rows, id_col,
        )
    a = new_bk.select(F.col(id_col).alias("ia"), "band", "bucket")
    b = new_bk.select(F.col(id_col).alias("ib"), "band", "bucket")
    nn = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib")
    )
    o = old_buckets.select(F.col(id_col).alias("_oid"), "band", "bucket")
    nw = new_bk.select(F.col(id_col).alias("_nid"), "band", "bucket")
    no = (
        o.join(nw, ["band", "bucket"])
        .filter(F.col("_oid") != F.col("_nid"))
        .select(
            F.least("_oid", "_nid").alias("ia"),
            F.greatest("_oid", "_nid").alias("ib"),
        )
    )
    cand = nn.unionByName(no).distinct().cache()
    cand_docs = cand.select(
        F.explode(F.array("ia", "ib")).alias(id_col)
    ).distinct()
    # bounded corpus touch: only colliding old docs are re-shingled
    old_cand_sh = shingles(
        old_docs.join(cand_docs, id_col, "left_semi"), n, id_col, text
    )
    sh_all = new_sh.join(cand_docs, id_col, "left_semi").unionByName(old_cand_sh)
    exact = jaccard_pairs(sh_all, tau, id_col)
    return exact.join(cand, ["ia", "ib"], "left_semi")


# ---------------------------------------------------------------------------
# SimHash


def simhash_dups(
    df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """SimHash near-dup pairs: 4x15-bit chunk bucketing (a pair within
    hamming distance 3 must agree on >=1 of the 4 chunks of the 60-bit
    signature — pigeonhole), verified with an exact popcount. Fully
    JVM (simhash_signatures) and DuckDB-oracle-checkable."""
    s = simhash_signatures(df, id_col, text)
    return hamming_pairs(
        s, sig_col="sim", id_col=id_col, bits=SIMHASH_BITS,
        max_hamming=max_hamming, n_chunks=4,
    )


def hamming_pairs(
    sigs: DataFrame,
    sig_col: str,
    id_col: str,
    bits: int,
    max_hamming: int,
    n_chunks: int | None = None,
) -> DataFrame:
    """Generic bounded-hamming pairing over fixed-width bit signatures
    (simhash, perceptual image hashes, ...): chunk the ``bits``-bit
    signature into ``n_chunks`` disjoint slices (default
    ``max_hamming + 1``) — by pigeonhole a pair within the distance
    bound must agree exactly on >= 1 slice — bucket-equi-join on
    (chunk, value), then verify with an exact JVM popcount. Never a
    cross join; bucket sizes are data-bounded (a slice value's
    population), the standard LSH-shaped scale path."""
    n_chunks = n_chunks or (max_hamming + 1)
    if n_chunks > bits:
        raise ValueError(f"n_chunks={n_chunks} > bits={bits}: empty slices")
    # Slices must EXACTLY partition the signature: ceil-sized chunks
    # overrun the width (bits=64, n_chunks=9 -> a shift of 64, which
    # Java masks to 0, aliasing the last slice onto the first and
    # silently dropping pairs at distance == max_hamming). Balanced
    # bounds c*bits//n_chunks give n_chunks non-empty disjoint slices.
    bounds = [(c * bits) // n_chunks for c in range(n_chunks + 1)]
    chunks = sigs.select(
        id_col,
        sig_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftrightunsigned(F.col(sig_col), bounds[c])
                    .bitwiseAND(F.lit((1 << (bounds[c + 1] - bounds[c])) - 1))
                    .alias("v"),
                )
                for c in range(n_chunks)
            ])
        ).alias("cc"),
    ).select(id_col, sig_col, "cc.chunk", "cc.v")
    a = chunks.select(
        F.col(id_col).alias("ia"), F.col(sig_col).alias("sa"), "chunk", "v"
    )
    b = chunks.select(
        F.col(id_col).alias("ib"), F.col(sig_col).alias("sb"), "chunk", "v"
    )
    pairs = (
        a.join(b, ["chunk", "v"])
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib", "sa", "sb")
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("ia", "ib", "hamming")
    )


# ---------------------------------------------------------------------------
# near-dup clustering (connected components -> canonical doc per cluster)


def dedup_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Training-data curation step after near-dup pair generation:
    group pairs into connected components and pick ONE canonical doc
    per component (the min id). Returns (id, cluster_id, keep).

    ``ids``: one row per document (singletons become their own
    cluster). ``pairs``: undirected near-dup edges (ia, ib) from any
    of the pair generators (LSH, n-gram Jaccard, SimHash, cosine).

    Hash-min label propagation: every node starts labeled with its own
    id; each round, labels flow across edges and every node keeps the
    min; converges in <= graph-diameter rounds (near-dup components
    are short chains in practice, so 2-4 rounds). Each round is one
    broadcast-or-shuffle join + a map-side-combinable min aggregation
    — no driver-side graph state, scales to any component count. The
    per-round ``localCheckpoint`` truncates the iterative lineage
    (plans would otherwise grow by one join per round, and driver
    analysis would dominate — see SURVEY §4 round-2 notes).
    """
    edges = pairs.select(F.col("ia").alias("_a"), F.col("ib").alias("_b"))
    edges = edges.unionByName(
        edges.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"))
    ).localCheckpoint(eager=True)
    labels = ids.select(
        F.col(id_col).alias("_v"), F.col(id_col).alias("_lbl")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        prop = edges.join(
            labels, edges["_a"] == labels["_v"], "inner"
        ).select(F.col("_b").alias("_v"), "_lbl")
        new_labels = (
            labels.unionByName(prop)
            .groupBy("_v")
            .agg(F.min("_lbl").alias("_lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("_lbl", "_old"), "_v", "inner"
            )
            .filter(F.col("_lbl") < F.col("_old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # a component with diameter > max_iter would silently come out
        # split — refuse instead (raise max_iter; near-dup graphs are
        # short chains, so hitting this means the input is not one)
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} rounds "
            f"({changed} labels still changing)"
        )
    return labels.select(
        F.col("_v").alias(id_col),
        F.col("_lbl").alias("cluster_id"),
        (F.col("_v") == F.col("_lbl")).alias("keep"),
    )


def keep_best(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware cluster keeper: instead of :func:`dedup_clusters`'
    min-id canonical doc, keep the HIGHEST-scoring member of each
    near-dup cluster (ties by min id) — the production curation rule
    ("keep the longest / highest-quality copy, drop its near-dups"),
    e.g. score = doc length, a Gopher/C4 quality score, or a bigram-LM
    bits-per-token (negated).

    ``clusters``: (id, cluster_id) membership — dedup_clusters /
    connected_components output. ``scores``: (id, score).

    Scale shape: one equi-join on the id, then ONE cluster-keyed hash
    aggregation with map-side partial ``min(struct(-score, id))`` — a
    mega-cluster (viral boilerplate) partial-aggregates instead of
    sorting inside a window, so hot clusters cost a combine, not a
    single-task sort. The winner joins back on cluster_id (plain hash
    join; cluster count scales with doc count, never broadcast).

    Returns (id, cluster_id, score, keep).
    """
    m = clusters.select(id_col, cluster_col).join(
        scores.select(id_col, score_col), id_col
    )
    best = m.groupBy(cluster_col).agg(
        F.min(
            F.struct(
                (-F.col(score_col)).alias("_ns"), F.col(id_col).alias("_id")
            )
        ).alias("_b")
    )
    return m.join(best, cluster_col).select(
        id_col,
        cluster_col,
        score_col,
        (F.col(id_col) == F.col("_b._id")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling-hash document fingerprinting)


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (the MOSS
    scheme): hash every character k-gram, slide a window of ``window``
    consecutive positions, keep each window's minimum hash — the
    selected set is a position-robust fingerprint: any shared
    substring of length >= k + window - 1 guarantees a shared
    fingerprint. Used for near-dup / containment detection where
    shingle sets are too coarse.

    All JVM: posexplode of the position range -> substring k-gram ->
    portable md5-derived 60-bit hash -> min over a rows-window
    per doc (ordered by position; one exchange on the doc id) ->
    distinct. Returns (id, fp) pairs.
    """
    # bind the normalized string ONCE: the regex normalization inside
    # the transform lambda would otherwise re-run per character
    # position (O(len^2) regex work per doc — lambdas defeat codegen
    # subexpression elimination)
    grams = df.select(
        F.col(id_col), F.expr(_norm_sql(text)).alias("_norm")
    ).select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(_norm) - {k} + 1, 1)), "
                f"i -> substring(_norm, i, {k}))"
            )
        ).alias("pos", "gram"),
    )
    h = F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("long")
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    # only FULL windows select a fingerprint (positions 0..P-w);
    # docs with fewer than w positions keep their single global min
    return (
        grams.select(id_col, "pos", h.alias("h"))
        .withColumn("_wmin", F.min("h").over(w))
        .withColumn(
            "_last",
            F.greatest(
                F.max("pos").over(Window.partitionBy(id_col)) - window + 1,
                F.lit(0),
            ),
        )
        .filter(F.col("pos") <= F.col("_last"))
        .select(F.col(id_col), F.col("_wmin").alias("fp"))
        .distinct()
    )


def _norm_sql(text: str) -> str:
    return f"regexp_replace(trim(lower({text})), '\\\\s+', ' ')"


def mirror_host_pairs(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    min_shared: int = 3,
    overlap_threshold: float = 0.5,
    max_fp_hosts: int = 16,
    id_col: str = "doc_id",
    host_col: str = "source",
    text: str = "text",
) -> DataFrame:
    """Mirror-host detection: pairs of hosts serving largely the same
    content (mirrors, CDNs under multiple names, scraped clones). A
    crawl frontier that knows host B mirrors host A can skip B's
    entire URL space — the host-level complement of the reference's
    per-URL seen-set (TSpider dedups URLs, not sites; at web scale
    mirrored SITES are the bigger win).

    Method: winnow each document (:func:`winnow_fingerprints` — any
    shared substring of length >= k+window-1 guarantees a shared
    fingerprint), lift to the distinct (host, fp) level, DROP
    fingerprints present on more than ``max_fp_hosts`` hosts
    (boilerplate/chrome shared by everyone — same doc-frequency guard
    as the media df filter, and the bound that keeps the pair join
    linear: each surviving fp emits at most C(max_fp_hosts, 2)
    host pairs), then equi-join on fp with host_a < host_b and score
    each pair by the OVERLAP COEFFICIENT |A∩B| / min(|A|, |B|) —
    robust to one side being a partial mirror, unlike Jaccard.

    Scale shape: the winnow explode is embarrassingly parallel; the
    (host, fp) distinct and the per-host totals are one exchange on
    fp/host; the pair join shuffles on fp with per-key fan-out
    bounded by ``max_fp_hosts``; per-host totals re-enter via a
    broadcast-sized join (host cardinality << doc cardinality). No
    cross join anywhere.

    Returns (host_a, host_b, shared_fps, fps_a, fps_b, overlap,
    is_mirror) for every host pair sharing >= ``min_shared``
    surviving fingerprints.
    """
    fps = winnow_fingerprints(df, k=k, window=window, id_col=id_col, text=text)
    host_fps = (
        fps.join(df.select(id_col, F.col(host_col).alias("host")), id_col)
        .select("host", "fp")
        .distinct()
    )
    rare = host_fps.join(
        host_fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_fp_hosts)
        .select("fp"),
        "fp",
    )
    # totals over the SAME rare-fp universe as the shared counts, so a
    # full clone scores overlap exactly 1.0 regardless of how much
    # boilerplate the hot-fp guard removed
    totals = rare.groupBy("host").agg(F.count(F.lit(1)).alias("n_fps"))
    pairs = (
        rare.select(F.col("host").alias("host_a"), "fp")
        .join(rare.select(F.col("host").alias("host_b"), "fp"), "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    return (
        pairs.join(
            F.broadcast(totals.select(F.col("host").alias("host_a"),
                                      F.col("n_fps").alias("fps_a"))),
            "host_a",
        )
        .join(
            F.broadcast(totals.select(F.col("host").alias("host_b"),
                                      F.col("n_fps").alias("fps_b"))),
            "host_b",
        )
        .withColumn(
            "overlap",
            F.col("shared_fps").cast("double")
            / F.least("fps_a", "fps_b").cast("double"),
        )
        .select(
            "host_a",
            "host_b",
            "shared_fps",
            "fps_a",
            "fps_b",
            F.round("overlap", 6).alias("overlap"),
            (F.col("overlap") >= F.lit(float(overlap_threshold)))
            .cast("int")
            .alias("is_mirror"),
        )
    )


# ---------------------------------------------------------------------------
# content-defined chunking (CDC) dedupe


def cdc_chunk_stats(
    df: DataFrame,
    k: int = 8,
    mask_bits: int = 6,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Content-defined chunking dedupe (the storage-dedup technique
    LSDC/FastCDC popularized, applied to corpus curation): cut each
    document at content-defined boundaries — positions whose rolling
    k-gram hash is 0 mod 2^mask_bits — so shared byte runs align to
    the SAME chunks regardless of where they sit in the document
    (insertion-robust, unlike fixed-size blocks). A chunk present in
    >= 2 distinct documents is duplicated content; the per-doc output
    is the duplicated-byte coverage, the signal RefinedWeb-style
    pipelines threshold to drop template-heavy pages.

    All JVM: posexplode positions -> k-gram md5 60-bit hash (the
    winnowing hash, reused) -> boundary filter -> per-doc lead()
    window over cut positions (one exchange on the doc id) ->
    substring chunks -> chunk-hash groupBy (map-side combinable)
    -> broadcast-or-shuffle join back -> per-doc aggregation. At
    10^10 docs the chunk table is O(corpus bytes / 2^mask_bits)
    rows keyed by uniform md5 hashes — no hot keys by construction.

    Returns (id, n_chunks, dup_chunks, total_bytes, dup_bytes,
    dup_ratio) with BIGINT counts and a float ratio.
    """
    norm = _norm_sql(text)
    # bind _norm before the lambda (same O(len^2) re-normalization
    # trap as the winnow gram builder above)
    grams = df.select(
        F.col(id_col), F.expr(f"{norm}").alias("_norm")
    ).select(
        F.col(id_col),
        F.col("_norm"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(_norm) - {k} + 1, 1)), "
                f"i -> substring(_norm, i, {k}))"
            )
        ).alias("pos", "gram"),
    ).withColumn("pos", F.col("pos") + 1)  # 1-based positions
    h = F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("long")
    mask = (1 << mask_bits) - 1
    cuts = (
        grams.select(id_col, "_norm", "pos", h.alias("_h"))
        .filter((F.col("_h").bitwiseAND(F.lit(mask)) == 0) & (F.col("pos") > 1))
        .select(id_col, "_norm", "pos")
        .unionByName(
            df.select(
                F.col(id_col), F.expr(norm).alias("_norm"), F.lit(1).alias("pos")
            )
        )
        .distinct()
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    chunks = cuts.withColumn("_next", F.lead("pos").over(w)).select(
        id_col,
        F.expr(
            "substring(_norm, pos, "
            "coalesce(_next, length(_norm) + 1) - pos)"
        ).alias("chunk"),
    )
    owners = chunks.groupBy(F.md5("chunk").alias("_ch")).agg(
        F.countDistinct(id_col).alias("_nd")
    )
    return (
        chunks.withColumn("_ch", F.md5("chunk"))
        .join(owners, "_ch")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("_nd") >= 2).cast("long")).alias("dup_chunks"),
            F.sum(F.length("chunk")).cast("long").alias("total_bytes"),
            F.sum(
                F.when(F.col("_nd") >= 2, F.length("chunk")).otherwise(0)
            )
            .cast("long")
            .alias("dup_bytes"),
        )
        .withColumn(
            "dup_ratio",
            F.when(F.col("total_bytes") == 0, F.lit(0.0)).otherwise(
                F.round(F.col("dup_bytes") / F.col("total_bytes"), 6)
            ),
        )
    )


# ---------------------------------------------------------------------------
# soft dedupe: reweight duplicates instead of dropping them


def soft_dedup_weights(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """SoftDeDup-style reweighting (ACL 2024 "SoftDedup: an Efficient
    Data Reweighting Method for Speeding Up Language Model
    Pre-training"): instead of DROPPING near-duplicates, keep every
    document but downweight it by its "commonness" — here the size of
    its near-dup connected component — so an n-times-duplicated
    passage contributes ~once in expectation while rare text keeps
    full weight. Composes :func:`dedup_clusters` (hash-min label
    propagation, per-round lineage cuts) with one map-side-combinable
    size aggregation and a cluster-keyed join; nothing new shuffles
    beyond the clustering itself, so the 10^10-doc story is the
    clustering's.

    Returns (id, cluster_id, commonness, weight) with
    weight = round(1/commonness, 6).
    """
    clusters = dedup_clusters(ids, pairs, id_col=id_col, max_iter=max_iter)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("commonness")
    )
    return clusters.join(sizes, "cluster_id").select(
        F.col(id_col),
        F.col("cluster_id"),
        F.col("commonness"),
        F.round(F.lit(1.0) / F.col("commonness"), 6).alias("weight"),
    )


def lsh_recall_eval(
    df: DataFrame,
    n: int = 3,
    tau: float = 0.9,
    k: int = 32,
    bands: int = 16,
    rows: int = 2,
    id_col: str = "doc_id",
    text: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Measure an LSH configuration against exact ground truth —
    the "measure, don't guess" harness for the dedup scale path.

    truth  = exact shingle-Jaccard pairs >= tau (the brute baseline)
    cand   = the band-bucket candidate pairs the LSH config surfaces
    n_hit  = truth ∩ cand (what the scale path would actually keep,
             since the pipeline exact-verifies candidates)

    recall        = n_hit / n_true   (pairs the config misses)
    cand_precision = n_hit / n_cand  (verify work wasted on non-dups)

    One row out; the three counts are independent 1-row aggregates
    broadcast-cross-joined (never a driver scalar). Run it at a small
    SF to pick (bands, rows) before committing the 100-TB job — the
    analytic miss bound (1 - tau^rows)^bands tells you where to look,
    this measures it on YOUR corpus.
    """
    sh = shingles(df, n, id_col, text)
    sh.cache()
    truth = jaccard_pairs(sh, tau, id_col).select("ia", "ib")
    cand = lsh_candidate_pairs(
        minhash_signatures(sh, k, id_col, hash_fn), bands, rows, id_col
    )
    truth.cache()
    cand.cache()
    hits = truth.join(cand, ["ia", "ib"], "left_semi")
    agg_true = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    agg_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    agg_hit = hits.agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    return (
        agg_true.crossJoin(F.broadcast(agg_cand))
        .crossJoin(F.broadcast(agg_hit))
        .select(
            "n_true",
            "n_cand",
            "n_hit",
            F.round(
                F.when(
                    F.col("n_true") > 0,
                    F.col("n_hit") * 1.0 / F.col("n_true"),
                ),
                6,
            ).alias("recall"),
            F.round(
                F.when(
                    F.col("n_cand") > 0,
                    F.col("n_hit") * 1.0 / F.col("n_cand"),
                ),
                6,
            ).alias("cand_precision"),
        )
    )
