"""Extraction operators E1-E9 (SURVEY.md §2.2): span arrays -> candidate
request records.

The reference runs an in-page JS program per URL (core.js:96-425) —
one browser process per page. Here the whole extraction is a single
declarative Spark plan: ``posexplode`` over the span array, JVM
whole-stage-codegen string expressions for the per-span rules, and ONE
``row_number`` window for the dedupe. No Python executes in this
operator at all.

Per-record semantics replicated:

* emission file order = all intercepted requests first, then static
  records, each in document (offset) order (core.js:32-51
  ``saveFile(static, requested)`` writes requested then static;
  casper_crawler.js:89-101 pushes requests in interception order).
* static link/media spans (E1): only http://, https://, //-prefixed
  hrefs (validScheme core.js:115-123), length < 1024 (core.js:316),
  fragment stripped and protocol-relative resolved against the page
  scheme (normalizeUrl core.js:125-131). ``javascript:`` hrefs become
  fired events, never records (core.js:306-313).
* form spans (E2): ``"<METHOD> <action>?<formdata>"``; a record is
  emitted only when the serialized formdata is non-empty
  (core.js:263-277); method upper-cased (core.js:266).
* request spans (E5): intercepted requestData emitted verbatim —
  note the F2 abort (core.js:12-30) fires *after* the record was
  pushed (casper_crawler.js:94-96), so it never filters records.
* dedupe (E7/E8): in-page JSON-equality dedupe within the static
  section plus the parse-time ``"{METHOD}|{url}"`` fingerprint
  keep-first across both sections (spider.py:118-122). The fingerprint
  subsumes the in-page dedupe, so one window implements both.
* headers (T9): static records carry ``Referer: <page url>``
  (core.js:321); Content-Length/User-Agent/Accept are dropped at parse
  time (spider.py:111-113) so request records carry an empty map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# columns a frontier task contributes to each candidate
TASK_COLS = ("task_url", "depth", "task_rank")


def extract_candidates(fetched: DataFrame) -> DataFrame:
    """fetched: one row per (frontier task ⋈ documents) match with
    columns ``task_url, depth, task_rank, doc_id, spans``.

    Returns candidate records:
    ``task_url, depth, task_rank, seq, method, url, postdata, headers,
    type`` where ``seq`` is the exact per-page emission rank after both
    dedupe passes (the reference's result-queue order).
    """
    s = fetched.select(
        *TASK_COLS,
        "doc_id",
        F.posexplode("spans").alias("pos", "span"),
    ).select(
        *TASK_COLS,
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.offset").alias("offset"),
        F.substring_index("doc_id", ":", 1).alias("page_scheme"),
    )

    def js_normalize(col):
        # core.js:125-131 — JVM expression, stays in codegen
        resolved = F.when(
            col.startswith("//"), F.concat("page_scheme", F.lit(":"), col)
        ).otherwise(col)
        return F.substring_index(resolved, "#", 1)

    valid_scheme = (
        F.col("text").startswith("http://")
        | F.col("text").startswith("https://")
        | F.col("text").startswith("//")
    )

    referer = F.create_map(F.lit("Referer"), F.col("doc_id"))
    empty_headers = F.expr("cast(map() as map<string,string>)")

    # E5: intercepted requests — section 0, verbatim
    requests = s.filter(F.col("kind") == "request").select(
        *TASK_COLS,
        "doc_id",
        F.lit(0).alias("section"),
        "offset",
        F.lit("GET").alias("method"),
        F.col("text").alias("url"),
        F.lit("").alias("postdata"),
        empty_headers.alias("headers"),
        F.lit("request").alias("type"),
    )

    # E1: static links + media src — section 1
    links = (
        s.filter(F.col("kind").isin("link", "media"))
        .filter(valid_scheme & (F.length("text") < 1024))
        .select(
            *TASK_COLS,
            "doc_id",
            F.lit(1).alias("section"),
            "offset",
            F.lit("GET").alias("method"),
            js_normalize(F.col("text")).alias("url"),
            F.lit("").alias("postdata"),
            referer.alias("headers"),
            F.lit("static").alias("type"),
        )
    )

    # E2: forms — "<METHOD> <action>?<qs>", record only when qs != ''
    form_rest = F.expr(
        "substring(text, length(substring_index(text, ' ', 1)) + 2)"
    )
    forms = (
        s.filter(F.col("kind") == "form")
        .withColumn("rest", form_rest)
        .withColumn("qs", F.when(
            F.instr("rest", "?") > 0,
            F.expr("substring(rest, instr(rest, '?') + 1)"),
        ).otherwise(F.lit("")))
        .filter(F.col("qs") != "")
        .select(
            *TASK_COLS,
            "doc_id",
            F.lit(1).alias("section"),
            "offset",
            F.upper(F.substring_index("text", " ", 1)).alias("method"),
            js_normalize(F.substring_index("rest", "?", 1)).alias("url"),
            F.col("qs").alias("postdata"),
            referer.alias("headers"),
            F.lit("static").alias("type"),
        )
    )

    cand = requests.unionByName(links).unionByName(forms)

    # E7+E8 — fingerprint keep-first on (METHOD, url) in file order
    # (requested section before static, offset order within section).
    # Implemented as a min-struct groupBy rather than a window: the
    # aggregate gets map-side partial combining and avoids a second
    # differently-keyed sort; the struct comparator keeps the earliest
    # (section, offset) record verbatim.
    passthru = ["section", "offset", "depth", "task_rank", "postdata",
                "headers", "type", "method"]
    deduped = (
        cand.groupBy("task_url", F.upper(F.col("method")).alias("_m"), "url")
        .agg(
            # min_by: comparator is (section, offset) only — headers is
            # a map and must stay out of the ordering key
            F.min_by(
                F.struct(*[F.col(c) for c in passthru]),
                F.struct("section", "offset"),
            ).alias("_first")
        )
        .select("task_url", "url", "_first.*")
        .drop("_m")
    )

    # exact per-page emission rank (the result-queue order)
    seq_w = Window.partitionBy("task_url").orderBy("section", "offset")
    return deduped.withColumn("seq", F.row_number().over(seq_w)).drop(
        "section", "offset"
    )
