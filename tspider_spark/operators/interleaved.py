"""Interleaved text+media document curation (OBELICS / MMC4-style).

The engine's input table is interleaved documents
``(doc_id, spans:array<struct<kind,text,media_ref,offset>>)`` —
BASELINE.json's input_hint shape, the same table the crawl fetch join
reads (reference analog: the rendered page the JS crawler walks,
core/spider/core.js:96-425 — text nodes interleaved with media
resources).  The text-only quality gates (quality.py) can't see span
STRUCTURE; these operators curate at that level, following the two
published interleaved-corpus pipelines:

* OBELICS (Laurencon et al. 2023 §3.2-3.3): per-document node stats —
  image count caps, image/text balance, consecutive-image ("image
  wall") limits — gate which crawled pages become training documents.
* MMC4 (Zhu et al. 2023 §3): images are ASSIGNED to surrounding text
  spans; here the deterministic zero-model reduction — each media span
  pairs with the nearest FOLLOWING text span (distance measured in
  span positions), the "caption candidate" a contrastive filter would
  then score.
* Media-sequence dedupe: mirror/template pages reuse the same ORDERED
  image sequence even when their text differs (boilerplate rotators,
  product templates); exact dedupe on the ordered media_ref fingerprint
  is the interleaved complement of text exact-dedupe
  (textdedup.exact_dedupe) and media payload dedupe
  (multimodal.media_dedup_exact — which keys on CONTENT, not sequence).

Physical shape, sized for the 10^10-row corpus:

* ``interleave_stats`` / ``interleave_gate`` / caption extraction are
  SHUFFLE-FREE: every statistic is computed inside the spans array with
  JVM higher-order functions (``filter``/``transform``/``aggregate``),
  one projection per doc, whole-stage codegen, no explode of the span
  table and no Python;
* ``caption_candidates`` explodes only the MEDIA spans (a small
  fraction of the array) after pairing in-array — output rows ∝ media
  count, not span count;
* ``media_sequence_dedup`` is ONE hash agg on a 32-char fingerprint
  (map-side combinable); group sizes are bounded by template reuse, so
  no skew beyond what AQE handles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spans(spans_col: str) -> Column:
    return F.col(spans_col)


def _media(spans_col: str) -> Column:
    return F.filter(_spans(spans_col), lambda s: s["kind"] == F.lit("media"))


def _text(spans_col: str) -> Column:
    return F.filter(_spans(spans_col), lambda s: s["kind"] == F.lit("text"))


def max_media_run(spans_col: str = "spans") -> Column:
    """Longest run of CONSECUTIVE media spans (OBELICS "image wall"
    signal), computed by a single in-array fold: accumulator carries
    (current run, best run). Relies on the spans array being in
    document order (offset order), which the corpus guarantees."""
    return F.aggregate(
        _spans(spans_col),
        F.struct(F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda a, s: F.struct(
            F.when(s["kind"] == "media", a["run"] + 1)
            .otherwise(F.lit(0))
            .alias("run"),
            F.greatest(
                a["best"],
                F.when(s["kind"] == "media", a["run"] + 1).otherwise(F.lit(0)),
            ).alias("best"),
        ),
        lambda a: a["best"],
    )


def interleave_stats(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Per-document span-composition profile — the gate inputs.

    Columns: ``n_spans, n_text, n_media, n_media_distinct, text_chars,
    media_share (media/total, 0.0 for empty docs), max_media_run,
    media_leading`` (doc starts with an image — OBELICS drops these
    from the caption-quality stratum). Shuffle-free JVM projection.
    """
    n_spans = F.size(_spans(spans_col))
    n_media = F.size(_media(spans_col))
    return docs.select(
        F.col(id_col),
        n_spans.alias("n_spans"),
        F.size(_text(spans_col)).alias("n_text"),
        n_media.alias("n_media"),
        F.size(
            F.array_distinct(
                F.transform(_media(spans_col), lambda s: s["media_ref"])
            )
        ).alias("n_media_distinct"),
        F.aggregate(
            _text(spans_col),
            F.lit(0).cast("long"),
            lambda a, s: a + F.length(s["text"]),
        ).alias("text_chars"),
        F.round(
            F.when(n_spans > 0, n_media.cast("double") / n_spans).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("media_share"),
        max_media_run(spans_col).alias("max_media_run"),
        (
            F.coalesce(
                F.element_at(_spans(spans_col), 1)["kind"] == "media",
                F.lit(False),
            )
        ).alias("media_leading"),
    )


def caption_candidates(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """MMC4-style media→text assignment, deterministic reduction: each
    media span pairs with the nearest text span at a LARGER offset
    (the paragraph that follows the image). Media with no following
    text (trailing image) yields a NULL caption — kept, so the gate
    can count uncaptioned media.

    Output: ``doc_id, media_ref, media_offset, caption,
    caption_offset, caption_gap`` (gap in span positions; NULL when
    uncaptioned). The pairing runs INSIDE the array (nested
    higher-order filter), then only media spans explode.
    """
    paired = F.transform(
        _media(spans_col),
        lambda m: F.struct(
            m["media_ref"].alias("media_ref"),
            m["offset"].alias("media_offset"),
            F.get(  # null-safe head: trailing media have no caption
                F.filter(
                    _spans(spans_col),
                    lambda t: (t["kind"] == F.lit("text"))
                    & (t["offset"] > m["offset"]),
                ),
                0,
            ).alias("cap"),
        ),
    )
    return (
        docs.select(F.col(id_col), F.explode(paired).alias("p"))
        .select(
            id_col,
            F.col("p.media_ref").alias("media_ref"),
            F.col("p.media_offset").alias("media_offset"),
            F.col("p.cap.text").alias("caption"),
            F.col("p.cap.offset").alias("caption_offset"),
            (F.col("p.cap.offset") - F.col("p.media_offset")).alias(
                "caption_gap"
            ),
        )
    )


def anchor_candidates(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Link → preceding-text ANCHOR assignment — the dual of
    ``caption_candidates``: each link span pairs with the nearest text
    span at a SMALLER offset (the sentence that introduces the link).
    Anchor text is the classic crawl-prioritization / target-page
    ranking signal that describes a URL from its REFERRERS rather than
    its own content (reference analog: the crawler walks ``<a>``
    elements whose text node sits beside the resolved href,
    core/spider/core.js:96-425 — the span array preserves exactly that
    adjacency). Leading links (no preceding text span) keep a NULL
    anchor so downstream profiles can count undescribed links.

    Output: ``doc_id, target, link_offset, anchor, anchor_offset,
    anchor_gap`` (gap in span positions; NULL when unanchored).

    Physical shape: pairing runs INSIDE the spans array (nested
    higher-order filter + reverse, whole-stage codegen, no Python) and
    only link spans explode — output rows ∝ link count, not span
    count. Shuffle-free.
    """
    paired = F.transform(
        F.filter(_spans(spans_col), lambda s: s["kind"] == F.lit("link")),
        lambda lk: F.struct(
            lk["text"].alias("target"),
            lk["offset"].alias("link_offset"),
            F.get(  # null-safe head of the reversed preceding-text list
                F.reverse(
                    F.filter(
                        _spans(spans_col),
                        lambda t: (t["kind"] == F.lit("text"))
                        & (t["offset"] < lk["offset"]),
                    )
                ),
                0,
            ).alias("anc"),
        ),
    )
    return (
        docs.select(F.col(id_col), F.explode(paired).alias("p"))
        .select(
            id_col,
            F.col("p.target").alias("target"),
            F.col("p.link_offset").alias("link_offset"),
            F.col("p.anc.text").alias("anchor"),
            F.col("p.anc.offset").alias("anchor_offset"),
            (F.col("p.link_offset") - F.col("p.anc.offset")).alias(
                "anchor_gap"
            ),
        )
    )


def anchor_profiles(
    links: DataFrame,
    target_col: str = "target",
    id_col: str = "doc_id",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target-HOST anchor profile over ``anchor_candidates``
    output: how the web describes each host. Feeds the authority /
    recrawl schedulers (a host whose inbound anchors are diverse and
    text-rich outranks one reached only by bare unanchored links) and
    spam triage (thousands of links sharing ONE anchor string is
    link-farm shape).

    Columns: ``host, n_links, n_docs, n_anchored, n_distinct_anchors,
    top_anchor, top_anchor_n, anchored_frac``. ``top_anchor`` ties
    break by anchor text ascending (deterministic); hosts with zero
    anchored links keep NULL top_anchor / top_anchor_n = -1.

    Physical shape, sized for 10^10 links: two map-side-combinable
    hash aggregations — (host, anchor) counts then an argmin-struct
    rollup per host — plus one host-keyed stats agg; NO window over
    the link table and nothing driver-side. Host cardinality is small
    relative to links, and the hot-host skew lands on hash aggs (which
    partial-combine), not on joins.
    """
    host = F.regexp_extract(F.col(target_col), r"^[a-z]+://([^/]+)", 1)
    per = links.select(
        host.alias("host"), F.col(id_col).alias("_doc"),
        F.col(anchor_col).alias("_anchor"),
    ).filter(
        # relative / scheme-relative / javascript: targets carry no
        # authority of their own — the URL layer resolves them before
        # scheduling; profiling keys on absolute targets only
        F.col("host") != ""
    )
    stats = per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("_doc").alias("n_docs"),
        F.count("_anchor").alias("n_anchored"),
        F.countDistinct("_anchor").alias("n_distinct_anchors"),
    )
    top = (
        per.filter(F.col("_anchor").isNotNull())
        .groupBy("host", "_anchor")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("host")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("neg"),
                    F.col("_anchor").alias("anchor"),
                )
            ).alias("t")
        )
        .select(
            "host",
            F.col("t.anchor").alias("top_anchor"),
            (-F.col("t.neg")).alias("top_anchor_n"),
        )
    )
    return stats.join(top, "host", "left").select(
        "host", "n_links", "n_docs", "n_anchored", "n_distinct_anchors",
        "top_anchor",
        F.coalesce("top_anchor_n", F.lit(-1)).alias("top_anchor_n"),
        F.round(
            F.col("n_anchored").cast("double") / F.col("n_links"), 6
        ).alias("anchored_frac"),
    )


def anchor_authority_scores(profiles: DataFrame) -> DataFrame:
    """Bridge from ``anchor_profiles`` to the authority frontier mode:
    ``(hostname, score)`` for ``schedule.rank_hosts_by_score``, with
    score = anchored_frac × anchor diversity
    (n_distinct_anchors / n_anchored) in [0, 1]. A host described by
    many DIFFERENT referrer texts outranks one reached only by bare
    links (anchored_frac → 0) or by a single farmed anchor string
    repeated across the web (diversity → 0). Pure projection."""
    return profiles.select(
        F.col("host").alias("hostname"),
        F.round(
            F.when(
                F.col("n_anchored") > 0,
                F.col("anchored_frac")
                * F.col("n_distinct_anchors")
                / F.col("n_anchored"),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("score"),
    )


def media_sequence_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """``doc_id, n_media, media_seq_key`` where the key is
    md5 over the ORDERED '|'-joined media_refs (portable: DuckDB md5
    agrees byte-for-byte). Docs with no media get a NULL key (they
    have no sequence to share). Shuffle-free."""
    refs = F.transform(_media(spans_col), lambda s: s["media_ref"])
    return docs.select(
        F.col(id_col),
        F.size(refs).alias("n_media"),
        F.when(
            F.size(refs) > 0, F.md5(F.concat_ws("|", refs))
        ).alias("media_seq_key"),
    )


def media_sequence_dedup(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Template/mirror-page groups: documents sharing an identical
    ordered media sequence. Keep-first (min doc id) — ONE map-side-
    combinable hash agg on the 32-char key, same shape as
    textdedup.exact_dedupe. Returns groups with >1 member:
    ``media_seq_key, keeper, n_docs, n_media``."""
    fp = media_sequence_fingerprint(docs, id_col, spans_col).filter(
        F.col("media_seq_key").isNotNull()
    )
    return (
        fp.groupBy("media_seq_key")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_docs"),
            F.first("n_media").alias("n_media"),
        )
        .filter(F.col("n_docs") > 1)
    )


def media_doc_frequency(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """``media_ref, doc_freq``: how many distinct documents each media
    asset appears in. ONE aggregation: the per-doc DISTINCT refs are
    computed in-array (no media-span explode beyond the distinct set),
    then a ref-keyed count — map-side combinable, no skew beyond the
    boilerplate refs themselves (which are exactly what AQE skew-split
    and the downstream filter exist for)."""
    refs = F.array_distinct(
        F.transform(_media(spans_col), lambda s: s["media_ref"])
    )
    return (
        docs.select(F.explode(refs).alias("media_ref"))
        .groupBy("media_ref")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )


def media_frequency_filter(
    docs: DataFrame,
    max_doc_freq: int,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """OBELICS §3.1-style high-frequency media removal: assets that
    appear in more than ``max_doc_freq`` documents are site furniture
    (logos, banners, tracking pixels, nav sprites), not content — their
    spans are cut from every document; text spans and offsets are
    untouched (downstream pairing reads original offsets).

    Physical shape: the hot set (refs with doc_freq > cap) is
    aggregated into ONE row and broadcast — a broadcast-of-one-row
    cross join like the corpus-stats idiom in bm25 — so the document
    table itself is never shuffled; the span cut is an in-array JVM
    filter. The hot set is bounded by total_media_spans / max_doc_freq
    (at 10^10 docs with a production cap this is thousands of refs —
    broadcastable); for aggressive caps where the hot set is itself
    corpus-scale, explode + anti-join + doc-keyed regroup is the
    fallback, at the cost of one doc_id exchange.

    Output: the input columns with ``spans`` filtered, plus
    ``n_media_before`` / ``n_media_dropped``.
    """
    hot = (
        media_doc_frequency(docs, id_col, spans_col)
        .filter(F.col("doc_freq") > max_doc_freq)
        .agg(F.sort_array(F.collect_list("media_ref")).alias("_hot"))
    )
    before = F.size(_media(spans_col))
    kept = F.filter(
        F.col(spans_col),
        lambda s: (s["kind"] != F.lit("media"))
        | ~F.array_contains(F.col("_hot"), s["media_ref"]),
    )
    return (
        docs.join(F.broadcast(hot))
        .withColumn("n_media_before", before)
        # n_media_before must be read back as a COLUMN here: the
        # `before` expression would re-evaluate over the replaced
        # (already filtered) spans and always yield dropped = 0
        .withColumn(spans_col, kept)
        .withColumn(
            "n_media_dropped",
            F.col("n_media_before") - F.size(_media(spans_col)),
        )
        .drop("_hot")
    )


def boilerplate_text_filter(
    docs: DataFrame,
    group_col: str,
    min_docs: int = 2,
    min_frac: float = 0.5,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Per-group repeated-text-span removal — the TEXT complement of
    :func:`media_frequency_filter`: a text span whose exact content
    recurs across a site's pages is navigation/footer/cookie-banner
    boilerplate, not prose (the span-structured analog of CCNet's
    paragraph-frequency rule; OBELICS removes these before its node
    stats). A span is boilerplate in its group when its text appears
    in at least ``max(min_docs, ceil(min_frac * group_docs))``
    DISTINCT documents of the group (both bounds matter: the fraction
    alone would flag everything in 1-doc groups, the count alone would
    flag shared phrases on huge sites).

    Physical shape: one (group, text) hash agg over in-array DISTINCT
    text values + one group-keyed doc-count agg, then the per-group
    boilerplate dimension (bounded by group_spans / min_docs) joins
    back on ``group_col`` — at engine scale that is the hostname
    exchange the admission fold already pays, and AQE broadcasts it
    when small. The span cut is an in-array JVM filter; media spans
    and offsets are untouched.

    Output: input columns with ``spans`` filtered, plus
    ``n_text_before`` / ``n_text_dropped``.
    """
    texts = F.array_distinct(
        F.transform(_text(spans_col), lambda s: s["text"])
    )
    tf = (
        docs.select(F.col(group_col).alias("_g"), F.explode(texts).alias("_t"))
        .groupBy("_g", "_t")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    gd = docs.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_docs")
    )
    cut = F.greatest(
        F.lit(int(min_docs)).cast("long"),
        F.ceil(F.lit(float(min_frac)) * F.col("_docs")),
    )
    hot = (
        tf.join(gd, "_g")
        .filter(F.col("_df") >= cut)
        .groupBy("_g")
        .agg(F.sort_array(F.collect_list("_t")).alias("_hot"))
    )
    before = F.size(_text(spans_col))
    kept = F.filter(
        F.col(spans_col),
        lambda s: (s["kind"] != F.lit("text"))
        | ~F.array_contains(
            F.coalesce(F.col("_hot"), F.array().cast("array<string>")),
            s["text"],
        ),
    )
    return (
        docs.join(hot, F.col(group_col) == F.col("_g"), "left")
        .withColumn("n_text_before", before)
        .withColumn(spans_col, kept)
        .withColumn(
            "n_text_dropped",
            F.col("n_text_before") - F.size(_text(spans_col)),
        )
        .drop("_g", "_hot")
    )


def interleave_gate(
    docs: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    min_media: int = 1,
    max_media: int = 8,
    max_media_share: float = 0.5,
    max_run: int = 2,
    min_text_chars: int = 20,
) -> DataFrame:
    """OBELICS-style composite keep/drop over the span profile, with
    '|'-joined scalar fail reasons (driver-canonicalizer-safe — no
    array columns; same convention as quality.gopher_filter).

    Defaults follow OBELICS §3.3's shape (their production values are
    tuned per-corpus): at least one image, image cap, image/text
    balance, no image walls, minimum text mass.
    """
    st = interleave_stats(docs, id_col, spans_col)
    checks = [
        (F.col("n_media") < min_media, "no_media"),
        (F.col("n_media") > max_media, "too_many_media"),
        (F.col("media_share") > max_media_share, "media_heavy"),
        (F.col("max_media_run") > max_run, "media_wall"),
        (F.col("text_chars") < min_text_chars, "too_little_text"),
    ]
    reasons = F.concat_ws(
        "|", *[F.when(cond, F.lit(name)) for cond, name in checks]
    )
    return st.select(
        id_col,
        "n_media",
        "media_share",
        "max_media_run",
        "text_chars",
        (reasons == "").alias("keep"),
        reasons.alias("fail_reasons"),
    )


def multimodal_token_costs(
    df: DataFrame,
    media_tokens: int = 576,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Training-token cost of an interleaved document: whitespace
    tokens across its text spans plus a FIXED ``media_tokens`` per
    media span — the ViT patch budget a vision encoder contributes per
    image in LLaVA/OBELICS-style interleaved training (576 = 24x24
    patches at 336px). The cost column is what multimodal sequence
    packing must budget by; token-only packing under-fills sequences
    by the image share.

    Shuffle-free JVM in-array fold (aggregate + filter over the span
    array); returns (id, n_text_tokens, n_media, mm_tokens) with
    BIGINT columns.
    """
    n_text_tokens = F.expr(
        f"aggregate(filter({spans_col}, s -> s.kind = 'text'), 0L, "
        "(acc, s) -> acc + size(split(trim(s.text), '\\\\s+')))"
    ).cast("long")
    n_media = F.expr(
        f"size(filter({spans_col}, s -> s.kind = 'media'))"
    ).cast("long")
    return df.select(
        F.col(id_col),
        n_text_tokens.alias("n_text_tokens"),
        n_media.alias("n_media"),
        (n_text_tokens + F.lit(int(media_tokens)) * n_media)
        .cast("long")
        .alias("mm_tokens"),
    )
