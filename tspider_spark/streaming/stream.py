"""Structured Streaming variants of the engine's dataflow
(SURVEY.md §2.8: the reference is a continuous producer/consumer
system with blocking-queue backpressure but no event-time semantics;
the batch wave loop is the canonical engine because exact global
ordering is required — these streaming operators are the continuous
ingestion path for deployments that trade exact ordering for
latency).

Operators:
* ``stream_candidate_dedupe`` — the streaming twin of F8: candidates
  arriving on a stream are deduped on scan_key within a watermark
  (dropDuplicatesWithinWatermark keeps state bounded, unlike the
  unbounded exact set the batch engine owns).
* ``stream_host_rate`` — per-host discovered-URL rates over event-time
  tumbling windows with late-data tolerance (A1's streaming analog).
* ``run_foreach_batch_crawl_step`` — micro-batch bridge: drains a
  candidate stream through the SAME admission fold the batch engine
  uses, committing through the same StateStore (foreachBatch).
* ``user_sessions`` — event-time sessionization (session_window).
* ``run_foreach_batch_incremental_dedupe`` — continuous corpus
  ingestion with wave-proportional near-dup dedupe against the
  persisted band index (incremental_lsh_dups under foreachBatch).
* ``run_foreach_batch_sketch_merge`` / ``run_foreach_batch_cms_merge``
  — the sketch-maintenance pair: per-host HLL registers max-merged
  and the count-min table sum-merged into the state store every
  micro-batch (bounded state, exact merge semantics).
* ``stream_budget_admission`` — F8+F9 as a custom stateful operator
  (applyInPandasWithState): per-host budget + admitted-key state
  carried across micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_candidate_dedupe(
    candidates: DataFrame,
    watermark_col: str = "event_time",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming URL-seen prefilter: exact within the watermark
    horizon, bounded state. Downstream, the batch anti-join against
    the committed seen set finalizes exactness (lambda-style)."""
    return candidates.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        ["scan_key"]
    )


def stream_host_rate(
    candidates: DataFrame,
    watermark_col: str = "event_time",
    delay: str = "10 minutes",
    window: str = "1 minute",
) -> DataFrame:
    # watermark only applies to streaming input; the same windowed agg
    # is batch-callable (used by the driver-contract oracle check)
    if candidates.isStreaming:
        candidates = candidates.withWatermark(watermark_col, delay)
    return (
        candidates
        .groupBy(F.window(watermark_col, window).alias("w"), "hostname")
        .agg(F.count("*").alias("n_urls"))
        .select(
            F.col("w.start").alias("window_start"),
            "hostname",
            "n_urls",
        )
    )


def run_foreach_batch_crawl_step(
    stream_df: DataFrame,
    store,
    cfg,
    checkpoint_dir: str,
):
    """Micro-batch bridge: each batch of candidate rows
    (hostname, scan_key, url, task_rank, seq, synth_rank) goes through
    seen anti-join + admission fold against the committed store —
    demonstrating that the batch operators compose unchanged under
    foreachBatch."""
    from tspider_spark.operators.dedupe import anti_join_seen
    from tspider_spark.operators.schedule import admit_wave

    def step(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        fresh = anti_join_seen(
            batch_df, store.read("seen_scanned"), "scan_key", use_bloom=False
        )
        admitted = admit_wave(
            fresh, store.read("host_budget"), cfg.max_per_host, cfg.reduce_first
        )
        budget_delta = admitted.groupBy("hostname").agg(
            F.count("*").alias("reqcount")
        )
        new_budget = (
            store.read("host_budget")
            .unionByName(budget_delta)
            .groupBy("hostname")
            .agg(F.sum("reqcount").alias("reqcount"))
        )
        store.commit(
            appends={"seen_scanned": admitted.select("hostname", "scan_key")},
            replaces={"host_budget": new_budget},
            meta={"last_stream_batch": batch_id},
        )

    return (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_foreach_batch_incremental_dedupe(
    stream_df: DataFrame,
    store,
    checkpoint_dir: str,
    n: int = 3,
    tau: float = 0.9,
    k: int = 32,
    bands: int = 16,
    rows: int = 2,
    hash_fn: str = "xxhash64",
):
    """Continuous corpus ingestion with wave-proportional near-dup
    dedupe: each micro-batch of (doc_id, text) rows is deduped against
    the corpus-so-far via :func:`~tspider_spark.operators.textdedup.
    incremental_lsh_dups` — signatures are computed for the batch
    only; the accumulated corpus participates through its PERSISTED
    band index (``band_index`` state table), never a full re-scan.

    Keep-first policy (matches the batch dedupe convention): a new doc
    appearing as the greater side of any >=tau pair is dropped;
    survivors are appended to ``dedup_docs`` and their band buckets to
    ``band_index`` in one atomic snapshot commit, so a killed stream
    resumes from the last consistent corpus+index pair.
    """
    from tspider_spark.operators.textdedup import (
        band_buckets,
        incremental_lsh_dups,
        minhash_signatures,
        shingles,
    )

    def step(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        batch_df = batch_df.select("doc_id", "text")
        pairs = incremental_lsh_dups(
            store.read("dedup_docs"),
            batch_df,
            n=n, tau=tau, k=k, bands=bands, rows=rows, hash_fn=hash_fn,
            old_buckets=store.read("band_index"),
        )
        drop = pairs.select(F.col("ib").alias("doc_id")).distinct()
        kept = batch_df.join(drop, "doc_id", "left_anti")
        idx_delta = band_buckets(
            minhash_signatures(shingles(kept, n), k, hash_fn=hash_fn),
            bands, rows,
        )
        store.commit(
            appends={"dedup_docs": kept, "band_index": idx_delta},
            meta={"last_dedup_batch": batch_id},
        )

    return (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def user_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Event-time sessionization: merge a key's events into sessions
    separated by >= ``gap`` of inactivity — ``F.session_window``, the
    native dynamic-gap session operator (works identically over a
    bounded DataFrame and a watermarked stream; on a stream add
    ``withWatermark(ts_col, ...)`` upstream and the state store
    expires closed sessions). One exchange on the key; the session
    merge is state-store/sort-local.

    Returns (key, session_start, n_events, total_value) with
    session_start = the session's first event time.
    """
    return (
        events.groupBy(
            F.col(key_col), F.session_window(F.col(ts_col), gap).alias("_w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            key_col,
            F.col("_w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def stream_budget_admission(
    candidates: DataFrame, max_per_host: int
) -> DataFrame:
    """F8+F9 as a CUSTOM STATEFUL streaming operator
    (``applyInPandasWithState``): per-host state carries the running
    request count and the admitted keys across micro-batches, so a
    host's budget is enforced continuously — the streaming twin of the
    batch admission fold for deployments that trade exact global
    ordering for latency.

    Exactness of the admission decision (not order) holds because the
    state is sufficient: an admitted key is remembered (duplicates
    drop forever), and a key rejected on budget stays rejected (the
    count never decreases). State stays tiny — at most ``cap`` keys
    per host (the reference's strict ``>`` check admits up to cap+1
    *requests* but state only ever holds admitted keys).

    Input: streaming DataFrame (hostname, scan_key, url). Output:
    admitted rows. Works identically on a bounded DataFrame via
    ``availableNow`` file streams (pinned by the test).
    """

    def admit(key, pdf_iter, state):
        # admission == "first (cap+1 − already-admitted) first-occurrence
        # keys in arrival order" (strict '>' check, redis_utils.py:188)
        # — all pandas batch ops, no per-row Python
        if state.exists:
            (count, seen_list) = state.get
            seen = list(seen_list)
        else:
            count, seen = 0, []
        out = []
        for pdf in pdf_iter:
            fresh = pdf[~pdf["scan_key"].isin(seen)].drop_duplicates("scan_key")
            room = max(0, (max_per_host + 1) - count)
            admitted = fresh.head(room)
            count += len(admitted)
            seen.extend(admitted["scan_key"].tolist())
            out.append(admitted)
        state.update((count, sorted(seen)))
        return iter(out)

    return candidates.groupBy("hostname").applyInPandasWithState(
        admit,
        outputStructType="hostname string, scan_key string, url string",
        stateStructType="reqcount long, admitted array<string>",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_foreach_batch_sketch_merge(
    stream_df: DataFrame,
    store,
    checkpoint_dir: str,
    key_col: str = "hostname",
    item_col: str = "url",
    b: int = 6,
):
    """Continuous per-host cardinality accounting: each micro-batch's
    (hostname, url) rows are sketched into HLL registers and MERGED
    into the persisted ``host_hll`` state table with a register-wise
    max — the streaming face of the store-sketches-not-numbers pattern
    (``operators/sketch.py``). State is ≤ 2^b rows per host FOREVER,
    whatever the stream's volume, and the merge is exactly the union
    semantics of HLL: the merged table equals the sketch of all items
    ever seen (pinned by test), so estimates read via
    :func:`~tspider_spark.operators.sketch.hll_estimate` never drift
    from a from-scratch batch sketch.

    Commits through the StateStore (one snapshot per micro-batch), so
    a killed stream resumes from the last consistent register table
    and ``tools/frontier_stats.py``-style readers can time-travel it.
    """
    from tspider_spark.operators.sketch import hll_registers

    def step(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        delta = hll_registers(batch_df, key_col, item_col, b).select(
            F.col("grp").alias("hostname"), "reg", "rho"
        )
        merged = (
            store.read("host_hll")
            .unionByName(delta)
            .groupBy("hostname", "reg")
            .agg(F.max("rho").alias("rho"))
        )
        store.commit(
            replaces={"host_hll": merged},
            meta={"last_sketch_batch": batch_id, "hll_b": b},
        )

    return (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_foreach_batch_cms_merge(
    stream_df: DataFrame,
    store,
    checkpoint_dir: str,
    item_col: str = "url",
    d: int = 4,
    w: int = 256,
):
    """The frequency half of the streaming sketch pair: each
    micro-batch's items fold into the persisted ``cms_state``
    count-min table by element-wise SUM (CMS merge), giving continuous
    hot-URL-pattern pressure from d·w counters of state total —
    however much traffic streams through. Merged counters equal the
    from-scratch batch sketch exactly (sum-merge is lossless on
    counters; pinned by test), and each micro-batch is one snapshot
    commit, so readers time-travel the sketch history.
    """
    from tspider_spark.operators.sketch import cms_table

    def step(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        delta = cms_table(batch_df, item_col, d, w)
        merged = (
            store.read("cms_state")
            .unionByName(delta)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        store.commit(
            replaces={"cms_state": merged},
            meta={"last_cms_batch": batch_id, "cms_d": d, "cms_w": w},
        )

    return (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
