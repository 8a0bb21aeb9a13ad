"""End-to-end corpus curation plan: the LLM-training-data pipeline
assembled from the individually oracle-checked operators.

The crawl engine (plans/crawl.py) produces documents; this plan turns
them into training-ready sequences the way the published pipelines do
(CCNet / Gopher / C4 / Dolma: clean → rule gates → model gate →
dedupe → pack):

1. normalize     — NFC + whitespace/control cleanup (quality.normalize_text)
2. rule gate     — Gopher composite pass/fail     (quality.gopher_filter)
3. model gate    — hashed-ngram linear classifier  (classify.linear_quality_scores)
4. exact dedupe  — fingerprint keep-first          (textdedup.dedupe_exact)
5. near dedupe   — MinHash-LSH pair drop (greater id) (textdedup.minhash_lsh_dups)
6. pack          — GPT-style sequence packing      (curate.pack_sequences)

Laziness: every stage returns a DataFrame; nothing is collected or
cached here, so Catalyst sees the whole pipeline and the caller
chooses what to materialize (at 100 TB each stage boundary is
typically a written table — the stage dict maps 1:1 onto those
tables). Each stage's SEMANTICS are pinned by that operator's own
contract oracle; this plan adds the composition and an engine-level
pytest that the stage counts are consistent (monotone keeps, dedupe
drops planted copies, packing covers every survivor exactly once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def curate_corpus(
    docs: DataFrame,
    weights: DataFrame | None = None,
    id_col: str = "doc_id",
    text: str = "text",
    stratum_col: str | None = None,
    n_buckets: int = 4096,
    quality_threshold: float = 0.5,
    min_words: int = 50,
    dedupe_tau: float = 0.9,
    seq_tokens: int = 2048,
    hash_fn: str = "xxhash64",
    split_weights: dict | None = None,
    split_group_col: str | None = None,
) -> dict[str, DataFrame]:
    """Run the full curation pipeline; returns the per-stage frames
    under stable keys: normalized, rule_pass, quality, kept_quality,
    exact_kept, near_pairs, deduped, [split,] packed.

    ``weights`` is the trained (bucket, weight) classifier table; pass
    None to skip the model gate (rule gates only). ``stratum_col``
    defaults to a single stratum when the corpus has no language
    column. ``hash_fn`` picks the cheap JVM hash for classifier +
    MinHash (the oracle-checked md5 twins cover correctness).

    ``split_weights`` (ordered {split: weight}) turns on leakage-safe
    holdout assignment AFTER dedupe, keyed on ``split_group_col``
    (site/source; defaults to the doc id when the corpus carries no
    group column — doc-keyed splits are only leakage-safe BECAUSE they
    run post-dedupe here). The FIRST dict key is the training split:
    only it is packed; eval splits stay documents in the ``split``
    stage frame (the published pipelines hold out documents, not
    packed sequences).
    """
    from tspider_spark.operators.classify import linear_quality_scores
    from tspider_spark.operators.curate import pack_sequences
    from tspider_spark.operators.quality import gopher_filter, normalize_text
    from tspider_spark.operators.textdedup import dedupe_exact, minhash_lsh_dups

    stages: dict[str, DataFrame] = {}

    norm = normalize_text(docs, id_col=id_col, text=text).select(
        id_col, F.col("clean_text").alias(text)
    )
    stages["normalized"] = norm

    gate = gopher_filter(norm, id_col=id_col, text=text, min_words=min_words)
    rule_pass = norm.join(
        gate.filter(F.col("passes")).select(id_col), id_col, "left_semi"
    )
    stages["rule_pass"] = rule_pass

    if weights is not None:
        scores = linear_quality_scores(
            rule_pass, weights, n_buckets=n_buckets,
            threshold=quality_threshold, id_col=id_col, text=text,
            hash_fn=hash_fn,
        )
        stages["quality"] = scores
        kept_quality = rule_pass.join(
            scores.filter(F.col("keep")).select(id_col), id_col, "left_semi"
        )
    else:
        kept_quality = rule_pass
    stages["kept_quality"] = kept_quality

    exact_kept = kept_quality.join(
        dedupe_exact(kept_quality, id_col=id_col, text=text).select(id_col),
        id_col,
        "left_semi",
    )
    stages["exact_kept"] = exact_kept

    near_pairs = minhash_lsh_dups(
        exact_kept, tau=dedupe_tau, id_col=id_col, text=text, hash_fn=hash_fn
    )
    stages["near_pairs"] = near_pairs
    drop = near_pairs.select(F.col("ib").alias(id_col)).distinct()
    deduped = exact_kept.join(drop, id_col, "left_anti")
    stages["deduped"] = deduped

    if split_weights:
        from tspider_spark.operators.curate import split_assign

        assigned = split_assign(
            deduped, split_weights,
            group_col=split_group_col or id_col,
        )
        stages["split"] = assigned
        train_name = next(iter(split_weights))
        deduped = assigned.filter(F.col("split") == train_name).drop("split")

    sized = deduped.withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col(text)), r"\s+"))
    )
    if stratum_col is None:
        sized = sized.withColumn("_stratum", F.lit("all"))
        stratum_col = "_stratum"
    stages["packed"] = pack_sequences(
        sized, seq_tokens, stratum_col=stratum_col, id_col=id_col
    )
    return stages


def curate_interleaved_corpus(
    docs: DataFrame,
    weights: DataFrame | None = None,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    min_media: int = 0,
    max_media: int = 8,
    max_media_share: float = 0.5,
    max_run: int = 2,
    min_text_chars: int = 20,
    media_max_doc_freq: int | None = None,
    boilerplate_group_col: str | None = None,
    boilerplate_min_docs: int = 2,
    boilerplate_min_frac: float = 0.5,
    **curate_kwargs,
) -> dict[str, DataFrame]:
    """OBELICS-shaped front-end over the INTERLEAVED input table
    (the crawl engine's own ``(doc_id, spans)`` fetch table), then the
    text pipeline:

    0  (opt) furniture cuts — high-frequency media removal
                      (``media_max_doc_freq``) and per-group repeated
                      text-span removal (``boilerplate_group_col``),
                      applied BEFORE the gate so logos and nav bars
                      don't count against a page's media caps or text
                      mass (OBELICS applies its dedup/boilerplate
                      passes before node stats for the same reason)
    0a. span gate   — media caps / balance / image-wall / text mass
                      (interleaved.interleave_gate; min_media=0 here —
                      text-only docs are curated, not dropped)
    0b. media-sequence dedupe — template/mirror pages sharing an
                      ordered image sequence keep only the min-id doc
    0c. captions    — MMC4-style media→text side table (the multimodal
                      training-pair output, not a filter)
    0d. flatten     — text spans concatenated in offset order become
                      the ``text`` column feeding curate_corpus()

    Extra stage keys: ``media_filtered``/``boilerplate_filtered``
    (when enabled), ``span_gate, seq_deduped, captions, flattened``;
    all curate_corpus() keys follow. Same laziness contract: nothing
    materialized here, stage dict == the 100 TB table boundaries.
    """
    from tspider_spark.operators.interleaved import (
        boilerplate_text_filter,
        caption_candidates,
        interleave_gate,
        media_frequency_filter,
        media_sequence_dedup,
        media_sequence_fingerprint,
    )

    stages: dict[str, DataFrame] = {}

    base_cols = docs.columns
    if media_max_doc_freq is not None:
        docs = media_frequency_filter(
            docs, media_max_doc_freq, id_col=id_col, spans_col=spans_col
        ).select(*base_cols)
        stages["media_filtered"] = docs
    if boilerplate_group_col is not None:
        docs = boilerplate_text_filter(
            docs, boilerplate_group_col, min_docs=boilerplate_min_docs,
            min_frac=boilerplate_min_frac, id_col=id_col,
            spans_col=spans_col,
        ).select(*base_cols)
        stages["boilerplate_filtered"] = docs

    gate = interleave_gate(
        docs, id_col=id_col, spans_col=spans_col, min_media=min_media,
        max_media=max_media, max_media_share=max_media_share,
        max_run=max_run, min_text_chars=min_text_chars,
    )
    stages["span_gate"] = gate
    kept = docs.join(
        gate.filter(F.col("keep")).select(id_col), id_col, "left_semi"
    )

    # drop every non-keeper member of a shared-media-sequence group:
    # fingerprint join on the 32-char key, anti vs (member != keeper)
    fp = media_sequence_fingerprint(kept, id_col=id_col, spans_col=spans_col)
    groups = media_sequence_dedup(kept, id_col=id_col, spans_col=spans_col)
    dup_members = (
        fp.join(groups, "media_seq_key")
        .filter(F.col(id_col) != F.col("keeper"))
        .select(id_col)
    )
    seq_deduped = kept.join(dup_members, id_col, "left_anti")
    stages["seq_deduped"] = seq_deduped

    stages["captions"] = caption_candidates(
        seq_deduped, id_col=id_col, spans_col=spans_col
    )

    flat = seq_deduped.select(
        F.col(id_col),
        F.concat_ws(
            " ",
            F.transform(
                F.filter(
                    F.col(spans_col), lambda s: s["kind"] == F.lit("text")
                ),
                lambda s: s["text"],
            ),
        ).alias("text"),
    )
    stages["flattened"] = flat

    stages.update(
        curate_corpus(flat, weights, id_col=id_col, text="text", **curate_kwargs)
    )
    return stages
