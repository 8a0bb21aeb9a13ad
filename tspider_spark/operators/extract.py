"""Extraction operators E1-E9 (SURVEY.md §2.2): span arrays -> candidate
request records.

The reference runs an in-page JS program per URL (core.js:96-425) —
one browser process per page. Here the whole extraction is a single
declarative Spark plan: ``posexplode`` over the span array, JVM
whole-stage-codegen CASE expressions for the per-kind rules, and two
``row_number`` windows (fingerprint dedupe + emission rank) that share
ONE hash exchange on ``task_url``.

Physical shape (deliberate — see .explain notes below):

* one pass over the input — the per-kind rules are CASE branches of a
  single projection, not a union of three re-scans;
* one shuffle: an explicit ``repartition(task_url)`` *before* the
  explode. Both windows only require clustering by ``task_url`` (their
  partition keys are supersets), so neither inserts an exchange, and
  the explode + string expressions run at full width even when the
  upstream scan has few input splits (a small corpus, or one file);
* no SortAggregate: ``min_by``/``min(struct)`` dedupe plans as a
  double SortAggregate (struct agg buffers are not hash-aggregable),
  which sorts the whole candidate set twice at scan parallelism. The
  keep-first window sorts once per partition instead;
* headers are attached *after* dedupe (they are a pure function of
  ``type`` and the page URL), so no map column flows through the
  dedupe sort.

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


def extract_candidates(fetched: DataFrame, partitions: int | None = None) -> DataFrame:
    """fetched: one row per (frontier task ⋈ documents) match with
    columns ``task_url, depth, task_rank, doc_id, spans``.

    Returns candidate records:
    ``task_url, depth, task_rank, seq, method, url, postdata, headers,
    type`` where ``seq`` is the exact per-page emission rank after both
    dedupe passes (the reference's result-queue order).

    ``partitions``: width of an explicit pre-explode exchange on
    ``task_url``. Pass an int when the input's partitioning is too
    coarse (e.g. a broadcast join over a few-split scan would serialize
    the explode). Pass 0/None to insert NO explicit exchange: the
    windows then reuse the input's existing task_url clustering (e.g.
    straight out of a shuffle-hash fetch join) or EnsureRequirements
    inserts one exchange itself.
    """
    if partitions:
        fetched = fetched.repartition(partitions, "task_url")

    # task passthrough: the fixed TASK_COLS plus the optional auth
    # context column (candidates inherit their parent task's context)
    task_cols = list(TASK_COLS) + (
        ["fetch_context"] if "fetch_context" in fetched.columns else []
    )

    # clustering by task_url satisfies both window requirements below
    # (their partition keys contain task_url) -> at most ONE exchange.
    s = (
        fetched
        .select(
            *task_cols,
            "doc_id",
            F.posexplode("spans").alias("pos", "span"),
        )
        .select(
            *task_cols,
            "doc_id",
            F.col("span.kind").alias("kind"),
            F.col("span.text").alias("text"),
            F.col("span.offset").alias("offset"),
            F.substring_index("doc_id", ":", 1).alias("page_scheme"),
        )
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

    is_request = F.col("kind") == "request"
    is_link = (
        F.col("kind").isin("link", "media")
        & valid_scheme
        & (F.length("text") < 1024)
    )
    # E2: "<METHOD> <action>?<qs>" — record only when qs != ''
    form_rest = F.expr(
        "substring(text, length(substring_index(text, ' ', 1)) + 2)"
    )
    form_qs = F.when(
        F.instr(form_rest, "?") > 0,
        F.expr(
            "substring(substring(text, length(substring_index(text, ' ', 1)) + 2),"
            " instr(substring(text, length(substring_index(text, ' ', 1)) + 2), '?') + 1)"
        ),
    ).otherwise(F.lit(""))
    is_form = (F.col("kind") == "form") & (form_qs != "")

    cand = (
        s.filter(is_request | is_link | is_form)
        .select(
            *task_cols,
            "doc_id",
            F.when(is_request, 0).otherwise(1).alias("section"),
            "offset",
            F.when(
                F.col("kind") == "form",
                F.upper(F.substring_index("text", " ", 1)),
            )
            .otherwise("GET")
            .alias("method"),
            F.when(is_request, F.col("text"))
            .when(
                F.col("kind") == "form",
                js_normalize(F.substring_index(form_rest, "?", 1)),
            )
            .otherwise(js_normalize(F.col("text")))
            .alias("url"),
            F.when(F.col("kind") == "form", form_qs).otherwise("").alias(
                "postdata"
            ),
            F.when(is_request, "request").otherwise("static").alias("type"),
        )
    )

    # E7+E8 — fingerprint keep-first on (METHOD, url) in file order
    # (requested section before static, offset order within section).
    # Both windows cluster by task_url (already the exchange key), so
    # each adds only an in-partition sort.
    w_dup = Window.partitionBy(
        "task_url", F.upper(F.col("method")), "url"
    ).orderBy("section", "offset")
    seq_w = Window.partitionBy("task_url").orderBy("section", "offset")

    deduped = (
        cand.withColumn("_rn", F.row_number().over(w_dup))
        .filter(F.col("_rn") == 1)
        .withColumn("seq", F.row_number().over(seq_w))
    )

    # T9 headers, a pure function of (type, page url) — attached after
    # the dedupe sorts so no map type flows through them
    headers = F.when(
        F.col("type") == "static",
        F.create_map(F.lit("Referer"), F.col("doc_id")),
    ).otherwise(F.expr("cast(map() as map<string,string>)"))

    return deduped.select(
        *task_cols,
        "seq",
        "method",
        "url",
        "postdata",
        headers.alias("headers"),
        "type",
    )
