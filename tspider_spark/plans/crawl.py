"""The crawl wave loop: the whole-site crawl lifecycle
(SURVEY.md §3.1) as a batch-iterative BFS driver.

Single-consumer FIFO order (the reference's canonical ordering) is
BFS: children enqueue strictly after every task already queued, so
pop order == (depth, within-depth enqueue order). Each wave therefore
processes one full depth level:

  frontier[depth=d] ordered by discovery_order
    -> consumer-side blocklist re-check (consumer.py:38)
    -> "fetch" = inner join against the documents table (a render
       failure == no matching doc_id)
    -> extraction (operators/extract.py, all-JVM)
    -> produce: derive URL struct (one pandas UDF), saved-dedupe F12 +
       results sink K1, scope gate F11, method gate F13, index-page
       synthesis A2, stateless filters, seen_scanned anti-join F8
       (bloom-prefilterable), admission fold F9 (operators/schedule.py)
    -> admitted tasks get global discovery_order, politeness slots,
       depth d+1 -> atomic state commit (sources/state.py).

Every wave reads exclusively from the committed store and ends in one
atomic manifest swap, so kill-at-any-point resume is exact by
construction (Q5/S5): rerunning wave d is idempotent.

Shuffle boundaries per wave (stated per north_rule) — exactly THREE:
(1) the fetch join's candidate exchange on task_url (documents
bucketable by doc_id hash for a storage-partitioned join; the
extraction dedupe + emission-rank windows share this exchange),
(2) ONE hash exchange on hostname that covers the seen_scanned
anti-join (co-partitioned — the seen table persists hostname for
this) AND the whole admission fold (dedupe window, budget window,
politeness slots: all keyed by hostname, zero further exchanges) —
this is the designated skew point, handled by AQE + host-bucket
salting for pathological hosts, (3) the small admitted-set global
sort for discovery_order (bounded by active-hosts × cap+1 rows).
With the bloom prefilter enabled, (2) splits into bloom-probe +
exact-join branches and the fold re-establishes host partitioning.
With ``slim_fold`` (default), exchange (2) carries ONLY the fold's
working set — (hostname, scan_key, task_rank, seq, synth_rank) — and
the wide payload strings (url, domain, fetch_context) are re-attached
after admission by broadcast-joining the cap-bounded admitted key-set
onto the cached candidate frames: a map-side hash probe that adds no
exchange and roughly halves the bytes shuffled/sorted at the skew
point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tspider_spark.config import CrawlConfig
from tspider_spark.functions.urlfuncs import with_url_info
from tspider_spark.operators import filters as FL
from tspider_spark.operators.dedupe import (
    anti_join_seen,
    anti_join_seen_copart,
    anti_join_seen_cuckoo,
    apply_cuckoo_delta,
    build_cuckoo_shard_df,
)
from tspider_spark.operators.extract import extract_candidates
from tspider_spark.operators.robots import (
    apply_crawl_delay,
    robots_filter,
    robots_filter_wildcard,
)
from tspider_spark.operators.schedule import (
    admit_wave,
    admit_wave_salted,
    assign_discovery_order,
    authority_rank,
    distributed_rank,
    politeness_slots,
)
from tspider_spark.sources.state import SCHEMAS, StateStore, empty_df


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        documents: DataFrame,
        state_path: str,
        config: CrawlConfig | None = None,
        robots: DataFrame | None = None,
        host_priorities: DataFrame | None = None,
        robots_rules: DataFrame | None = None,
    ):
        self.spark = spark
        self.documents = documents
        self.cfg = config or CrawlConfig()
        self.robots = robots if (config and config.robots_enabled) else None
        # full RFC 9309 evaluation (Allow precedence + */$ wildcards):
        # when the caller supplies the (host, prefix, allow) rule table
        # (parse_robots_rules), scope checks route through the wildcard
        # evaluator instead of the disallow-prefix summary; crawl-delay
        # pacing still reads the parse_robots summary. Opt-in — absent
        # rules preserve the prior (and reference-parity) behaviour.
        self.robots_rules = (
            robots_rules if (config and config.robots_enabled) else None
        )
        # authority-priority mode (cfg.priority="authority"): like
        # ``documents``, the priority table is an input the caller
        # re-supplies on resume (the MODE round-trips via store meta)
        self.host_priorities = host_priorities
        if self.cfg.priority == "authority" and host_priorities is None:
            raise ValueError(
                "priority='authority' needs a host_priorities DataFrame "
                "(hostname, priority) — see schedule.rank_hosts_by_score"
            )
        self.store = StateStore(spark, state_path)

    def _finalize_frontier(self, tasks: DataFrame) -> DataFrame:
        """Politeness slots + robots crawl-delay pacing metadata."""
        tasks = politeness_slots(tasks)
        if self.robots is not None:
            return apply_crawl_delay(tasks, self.robots)
        return tasks.withColumn("planned_offset_ms", F.lit(0).cast("long"))

    # ------------------------------------------------------------------
    def seed(self, seeds: list | DataFrame, fresh: bool = True):
        """Q4/S1/S2 — fresh-start reset + seed wave. Seeds pass through
        the same admission fold (valid_task_url, redis_utils.py:149-166)
        sequentially in file order; each *admitted* seed's scope key is
        whitelisted (tspider.py:82-95)."""
        if fresh:
            self.store.destroy()
        if isinstance(seeds, list):
            seeds = self.spark.createDataFrame(
                [(s, i) for i, s in enumerate(seeds)], "url string, seed_order int"
            )
        # S7 auth context (reference --cookie-file): per-seed opaque
        # context id, "" = anonymous. Inherited by every child task.
        if "fetch_context" not in seeds.columns:
            seeds = seeds.withColumn("fetch_context", F.lit(""))
        if self.cfg.strip_tracking:
            from tspider_spark.functions.urlfuncs import (
                strip_tracking_params,
            )

            seeds = seeds.withColumn("url", strip_tracking_params("url"))
        s = with_url_info(seeds, "url")
        s = s.filter(FL.stateless_valid(self.cfg.blocklist))
        if self.cfg.url_block_keywords:
            s = s.filter(FL.url_keyword_keep(
                "u.url", tuple(self.cfg.url_block_keywords),
                self.cfg.url_keyword_threshold,
            ))
        if self.robots_rules is not None:
            s = robots_filter_wildcard(
                s, self.robots_rules,
                host_col="u.hostname", path_col="u.path",
            )
        elif self.robots is not None:
            s = robots_filter(s, self.robots, host_col="u.hostname")
        cands = s.select(
            F.col("u.hostname").alias("hostname"),
            F.col("u.scan_key").alias("scan_key"),
            F.col("u.url").alias("url"),
            F.col("u.domain").alias("domain"),
            F.col("seed_order").cast("long").alias("task_rank"),
            F.lit(0).alias("seq"),
            F.lit(1).alias("synth_rank"),
            F.coalesce("fetch_context", F.lit("")).alias("fetch_context"),
        )
        empty_budget = empty_df(self.spark, SCHEMAS["host_budget"])
        # cache the rank INPUT: distributed_rank references its input
        # subtree three times (local rank, bucket counts, offset join);
        # without a cache barrier the whole upstream plan is duplicated
        # per reference and Catalyst optimization time explodes
        admitted_raw = admit_wave(
            cands, empty_budget, self.cfg.max_per_host, self.cfg.reduce_first
        ).cache()
        admitted = assign_discovery_order(admitted_raw, start=-1).cache()

        scope_key = F.col("domain") if self.cfg.tld else F.col("hostname")
        frontier = self._finalize_frontier(
            admitted.select(
                "url", "hostname", "domain", F.lit(0).alias("depth"),
                "discovery_order", "fetch_context",
            )
        )
        replaces = {
            "whitelist": admitted.select(scope_key.alias("scope_key")).distinct(),
            "host_budget": admitted.groupBy("hostname").agg(
                F.count("*").alias("reqcount")
            ),
        }
        if self.cfg.cuckoo_filter:
            replaces["seen_filter"] = build_cuckoo_shard_df(
                admitted.select("scan_key"), "scan_key",
                self.cfg.bloom_shards, self._cuckoo_cap_per_shard,
            )
        self.store.commit(
            appends={
                "frontier": frontier,
                "seen_scanned": admitted.select("hostname", "scan_key"),
            },
            replaces=replaces,
            meta={
                "next_depth": 0,
                "next_order": (n_seeds := admitted.count()),
                "next_save_order": 0,
                "last_scheduled": n_seeds,
                "config": self.cfg.to_meta(),
            },
        )
        admitted.unpersist()
        admitted_raw.unpersist()

    # ------------------------------------------------------------------
    def seed_from_text_file(
        self, path: str, fresh: bool = True, fetch_context: str = ""
    ):
        """S2 — one URL per line, blanks skipped, line number = seed
        order (producer.create_task_from_file, producer.py:116-127).
        ``fetch_context``: auth context applied to every seed (the
        --cookie-file analog, tspider.py:32)."""
        from pyspark.sql.functions import monotonically_increasing_id, trim

        raw = self.spark.read.text(path).select(trim("value").alias("url"))
        # preserve file order: zip with a line index before filtering
        lines = raw.withColumn("seed_order",
                               monotonically_increasing_id().cast("int"))
        seeds = lines.filter(F.col("url") != "")
        self.seed(
            seeds.select(
                "url", "seed_order", F.lit(fetch_context).alias("fetch_context")
            ),
            fresh=fresh,
        )

    # ------------------------------------------------------------------
    def add_blocklist(self, dnsname: str):
        """Q7 — runtime domain block (tools/block_domain.py); takes
        effect at the next wave's consumer-side re-check. Tasks the
        re-check drops are recorded in blocked_tasks so
        remove_blocklist can restore them."""
        self.cfg.blocklist.append(dnsname)
        meta = self.store.meta()
        conf = meta.get("config", self.cfg.to_meta())
        conf["blocklist"] = list(self.cfg.blocklist)
        self.store.commit(meta={"config": conf})

    # ------------------------------------------------------------------
    @property
    def _cuckoo_cap_per_shard(self) -> int:
        return max(1024, self.cfg.cuckoo_capacity // self.cfg.bloom_shards)

    def _seen_filter(self) -> tuple[DataFrame, list | None]:
        """(shard table df, collected rows) for the persistent cuckoo
        filter. Bootstraps from the full seen_scanned table when the
        filter doesn't exist yet (resume of a pre-cuckoo store, or the
        flag toggled on mid-crawl) — one-time cost; afterwards every
        wave merges only its admitted delta.

        ``cuckoo_probe="copart"``: rows is None and the filter NEVER
        touches the driver — the df reads the persisted shards
        straight from the store (a bootstrap is localCheckpoint-pinned
        so delta merges don't rescan seen_scanned). At the config's
        own 10^10-key target the filter is ~26 GB, so the broadcast
        mode's per-wave collect is the scale-killer this avoids (r3
        verdict finding #4).

        ``cuckoo_probe="broadcast"``: collected rows, memoized on the
        manifest's seen_filter entry — an unchanged filter (no commit
        touched it) is NOT re-collected wave over wave. The df handle
        is rebuilt from the rows so downstream delta merges don't
        recompute the bootstrap plan."""
        entry = self.store.manifest()["tables"].get("seen_filter")
        if entry:
            # shard-layout guard (ADVICE r4): keys hash to shards
            # modulo bloom_shards, so probing a filter persisted under
            # a DIFFERENT shard count gives false negatives that
            # bypass the exact anti-join and re-admit crawled URLs.
            stored = self.store.meta().get("config", {}).get("bloom_shards")
            if stored is not None and int(stored) != self.cfg.bloom_shards:
                raise RuntimeError(
                    f"bloom_shards={self.cfg.bloom_shards} does not match "
                    f"the persisted seen_filter layout ({stored} shards) — "
                    "resume with the original shard count, or rebuild the "
                    "filter (tools/rebuild_seen_cache.py)"
                )
        if self.cfg.resolved_cuckoo_probe() == "copart":
            if entry:
                df = self.store.read("seen_filter")
            else:
                df = build_cuckoo_shard_df(
                    self.store.read("seen_scanned"), "scan_key",
                    self.cfg.bloom_shards, self._cuckoo_cap_per_shard,
                ).localCheckpoint(eager=True)
            return df, None
        memo_key = repr(entry) if entry else None
        memo = getattr(self, "_seen_filter_memo", None)
        if memo is not None and memo_key is not None and memo[0] == memo_key:
            rows = memo[1]
        elif entry:
            rows = self.store.read("seen_filter").collect()
            self._seen_filter_memo = (memo_key, rows)
        else:
            rows = build_cuckoo_shard_df(
                self.store.read("seen_scanned"), "scan_key",
                self.cfg.bloom_shards, self._cuckoo_cap_per_shard,
            ).collect()
        if rows:
            df = self.spark.createDataFrame(rows, SCHEMAS["seen_filter"])
        else:
            df = empty_df(self.spark, SCHEMAS["seen_filter"])
        return df, rows

    # ------------------------------------------------------------------
    def remove_blocklist(self, dnsname: str, readmit: bool = True) -> int:
        """Inverse of add_blocklist — deletion-driven re-admission.
        The reference has no unblock tool: a task its consumer re-check
        (consumer.py:38) drops stays in the Redis url_scanned set
        (marked at schedule time, redis_utils.py:184-196) and is lost
        to the crawl forever. This extension makes unblocking restore
        exactly those tasks.

        Which seen-set entries are forgotten: ONLY the scan_keys of
        tasks that were scheduled and then dropped by the re-check
        while blocked (recorded in blocked_tasks). Everything else
        survives — keys of URLs actually fetched, keys on other hosts,
        and saved-result dedupe keys. Candidates filtered by F10
        *before* scheduling never entered the seen set, so they have
        nothing to forget and re-admit naturally once unblocked.

        Mechanics: forgotten keys are deleted from the exact
        seen_scanned table (copy-on-write rewrite — the Iceberg
        MERGE/delete-file analog; a rare admin op), their host_budget
        contribution is returned, and — when cfg.cuckoo_filter is on —
        they are deleted from the persistent cuckoo shards
        (CuckooFilter.delete: the reason this path needs a cuckoo, not
        a bloom). With ``readmit`` (default) the dropped tasks then
        re-run through the normal admission fold (budget cap still
        applies) and re-enter the frontier at the CURRENT depth with
        fresh discovery_order (their original BFS position has passed;
        a task that no longer fits its host budget stays forgotten and
        unscheduled, like any over-budget URL). With ``readmit=False``
        nothing is re-inserted — the keys are simply forgotten, so a
        future wave that rediscovers those URLs admits them fresh.
        Returns the number of tasks re-admitted (0 for readmit=False).
        """
        self.cfg.blocklist = [b for b in self.cfg.blocklist if b != dnsname]
        meta = self.store.meta()
        conf = meta.get("config", self.cfg.to_meta())
        conf["blocklist"] = list(self.cfg.blocklist)

        blocked = self.store.read("blocked_tasks")
        pred = FL.frontier_not_blocklisted(self.cfg.blocklist)
        unblocked = blocked.filter(pred).cache()
        if unblocked.isEmpty():
            unblocked.unpersist()
            self.store.commit(meta={"config": conf})
            return 0
        still_blocked = blocked.filter(~pred)

        derived = with_url_info(unblocked, "url").select(
            "url", "hostname", "domain", "discovery_order", "fetch_context",
            F.col("u.scan_key").alias("scan_key"),
        ).cache()
        forgotten = derived.select("hostname", "scan_key")

        new_seen = self.store.read("seen_scanned").join(
            forgotten, ["hostname", "scan_key"], "left_anti"
        )
        refund = forgotten.groupBy("hostname").agg(
            (-F.count("*")).alias("reqcount")
        )
        budget0 = (
            self.store.read("host_budget")
            .unionByName(refund)
            .groupBy("hostname")
            .agg(F.sum("reqcount").alias("reqcount"))
            .filter(F.col("reqcount") > 0)
        )

        filt_df = None
        if self.cfg.cuckoo_filter:
            filt_df, _ = self._seen_filter()
            filt_df = apply_cuckoo_delta(
                filt_df, forgotten.select("scan_key"), "scan_key",
                self.cfg.bloom_shards, self._cuckoo_cap_per_shard, op="delete",
            )

        n_adm = 0
        caches = [unblocked, derived]
        if readmit:
            cands = derived.select(
                "hostname", "scan_key", "url", "domain",
                F.col("discovery_order").alias("task_rank"),
                F.lit(0).alias("seq"), F.lit(1).alias("synth_rank"),
                F.coalesce("fetch_context", F.lit("")).alias("fetch_context"),
            )
            admitted_raw = admit_wave(
                cands, budget0, self.cfg.max_per_host, self.cfg.reduce_first
            ).cache()
            next_order = int(meta["next_order"])
            admitted = assign_discovery_order(
                admitted_raw, start=next_order - 1
            ).cache()
            caches += [admitted_raw, admitted]
            n_adm = admitted.count()
            depth = int(meta["next_depth"])
            new_frontier = self._finalize_frontier(
                admitted.select(
                    "url", "hostname", "domain", F.lit(depth).alias("depth"),
                    "discovery_order", "fetch_context",
                )
            )
            new_seen = new_seen.unionByName(
                admitted.select("hostname", "scan_key")
            )
            budget0 = (
                budget0.unionByName(
                    admitted.groupBy("hostname").agg(
                        F.count("*").alias("reqcount")
                    )
                )
                .groupBy("hostname")
                .agg(F.sum("reqcount").alias("reqcount"))
            )
            if filt_df is not None:
                filt_df = apply_cuckoo_delta(
                    filt_df, admitted.select("scan_key"), "scan_key",
                    self.cfg.bloom_shards, self._cuckoo_cap_per_shard, op="add",
                )

        replaces = {
            "seen_scanned": new_seen,
            "host_budget": budget0,
            "blocked_tasks": still_blocked,
        }
        if filt_df is not None:
            replaces["seen_filter"] = filt_df
        meta_out = {"config": conf}
        appends = {}
        if n_adm:
            appends["frontier"] = new_frontier
            meta_out["next_order"] = int(meta["next_order"]) + n_adm
            # the re-admitted rows extend the CURRENT depth's frontier
            # slice, so the wave-termination counter must see them
            meta_out["last_scheduled"] = (
                int(meta.get("last_scheduled") or 0) + n_adm
            )
        self.store.commit(appends=appends, replaces=replaces, meta=meta_out)
        for df in caches:
            df.unpersist()
        return n_adm

    # ------------------------------------------------------------------
    def run(self, max_waves: int | None = None) -> dict:
        """Drive waves until the frontier drains (A3 termination)."""
        stats = {"waves": 0, "scheduled": 0, "saved": 0, "candidates": 0}
        limit = max_waves if max_waves is not None else self.cfg.max_waves
        while limit is None or stats["waves"] < limit:
            wave_stats = self.wave()
            if wave_stats is None:
                break
            stats["waves"] += 1
            for k in ("scheduled", "saved", "candidates"):
                stats[k] += wave_stats[k]
        return stats

    # ------------------------------------------------------------------
    def wave(self) -> dict | None:
        meta = self.store.meta()
        depth = int(meta["next_depth"])
        next_order = int(meta["next_order"])
        next_save = int(meta["next_save_order"])

        # A3 termination from committed metadata: the previous wave's
        # admitted count IS the current frontier depth's size, so no
        # Spark job is needed to detect the drained frontier (isEmpty
        # is kept as the fallback for resuming from pre-existing state)
        last_sched = meta.get("last_scheduled")
        if last_sched is not None and int(last_sched) == 0:
            return None
        frontier = self.store.read("frontier")
        tasks = frontier.filter(F.col("depth") == depth)
        if last_sched is None and tasks.isEmpty():
            return None  # A3: crawl complete

        # consumer-side blocklist re-check (consumer.py:38) — uses the
        # *current* blocklist, which may have grown since scheduling.
        # Pure string ops over the persisted (hostname, domain): no URL
        # re-derivation at the root of the wave plan. Dropped tasks are
        # recorded (blocked_tasks) so remove_blocklist can forget their
        # seen-set keys and restore them; zero cost when no blocklist.
        dropped = None
        if self.cfg.blocklist:
            not_blocked = FL.frontier_not_blocklisted(self.cfg.blocklist)
            dropped = tasks.filter(~not_blocked)
            tasks = tasks.filter(not_blocked)

        # authority-priority mode: remap this depth's task order to
        # (host priority, discovery) — everything downstream (fetch,
        # extraction windows, save order, admission fold, next-wave
        # discovery ranks) follows task_rank's ordering only, so the
        # wave replays the sequential priority drain exactly. Cached:
        # distributed_rank references its input subtree three times.
        rank_col = "discovery_order"
        ranked_tasks = None
        if self.cfg.priority == "authority":
            tasks = ranked_tasks = authority_rank(
                tasks, self.host_priorities
            ).cache()
            rank_col = "wave_rank"

        # --- fetch (S3): frontier ⋈ documents --------------------------
        # When the documents table carries a ``ctx`` column (auth-gated
        # page variants), a task only "renders" docs visible to its
        # fetch context: ctx NULL == public, else ctx must equal the
        # task's context (reference: cookie injection decides what the
        # browser sees, casper_crawler.js:47-77).
        t = tasks.select(
            F.col("url").alias("task_url"),
            F.col("depth"),
            F.col(rank_col).alias("task_rank"),
            F.coalesce("fetch_context", F.lit("")).alias("fetch_context"),
        )
        cond = F.col("task_url") == F.col("doc_id")
        if "ctx" in self.documents.columns:
            cond = cond & (
                F.col("ctx").isNull() | (F.col("ctx") == F.col("fetch_context"))
            )
            fetched = t.join(self.documents, cond, "inner")
            # the cookie-bearing browser renders the authed variant
            # INSTEAD of the public one: keep only the best-matching
            # variant per (task, context). The window partitions by
            # the join's own exchange key, so no extra shuffle.
            from pyspark.sql import Window as _W

            rank = F.when(F.col("ctx") == F.col("fetch_context"), 0).otherwise(1)
            w_ctx = _W.partitionBy("task_url", "fetch_context")
            fetched = (
                fetched.withColumn("_ctx_rank", rank)
                .withColumn("_ctx_best", F.min("_ctx_rank").over(w_ctx))
                .filter(F.col("_ctx_rank") == F.col("_ctx_best"))
                .drop("_ctx_rank", "_ctx_best", "ctx")
            )
        else:
            fetched = t.join(self.documents, cond, "inner")

        cands = extract_candidates(fetched)
        if self.cfg.strip_tracking:  # canonicalization extension
            from tspider_spark.functions.urlfuncs import (
                strip_tracking_params,
            )

            cands = cands.withColumn(
                "url", strip_tracking_params("url")
            )
        # materialize the raw extraction ONCE before the hybrid URL
        # derivation: with_url_info's two-branch union otherwise scans
        # (and re-executes) the whole fetch+extract pipeline twice per
        # wave. The precomputed _fe flag makes each branch filter a
        # boolean read instead of a second regex pass.
        from tspider_spark.functions.urlfuncs import fast_eligible

        cands_raw = cands.withColumn("_fe", fast_eligible(F.col("url")))
        if self.cfg.truncate_plan:
            cands_raw = cands_raw.localCheckpoint(eager=True)
        else:
            cands_raw.cache()
        cands = with_url_info(cands_raw, "url", eligible_col="_fe").filter(
            F.col("u.valid")
        )
        if self.cfg.truncate_plan:
            # lineage barrier (see CrawlConfig.truncate_plan): the
            # candidate set is materialized here either way — the
            # checkpoint additionally makes it a *leaf* for every
            # downstream analysis pass
            cands = cands.localCheckpoint(eager=True)
        else:
            cands.cache()

        # --- F12/K1: saved-dedupe + results sink ------------------------
        whitelist = self.store.read("whitelist")
        cands_t = FL.is_target(cands, whitelist, self.cfg.tld)
        cands_t.cache()

        saved_key = F.concat("method", F.lit("-"), F.col("u.pattern"))
        from pyspark.sql import Window

        w_saved = Window.partitionBy("saved_key").orderBy("task_rank", "seq")
        # saved-set dedupe against (bucketed base, appended delta) —
        # same split as the seen anti-join: after a compaction the
        # accumulated saved keys are never exchanged (the bucketed
        # scan satisfies the join, whose candidate-side saved_key
        # hash partitioning is exactly what w_saved needs anyway);
        # the between-compactions delta broadcasts.
        saved_base, saved_delta = self.store.read_split("seen_saved")
        marked = cands_t.withColumn("saved_key", saved_key)
        if saved_base is not None:
            marked = marked.join(saved_base, "saved_key", "left_anti")
            if saved_delta is not None:
                marked = marked.join(saved_delta, "saved_key", "left_anti")
        else:
            marked = marked.join(saved_delta, "saved_key", "left_anti")
        new_saved = (
            marked
            .withColumn("_rn", F.row_number().over(w_saved))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        ).cache()  # cache barrier: rank input is referenced 3x (see seed())
        # two-phase distributed rank: the new-saved set is NOT bounded
        # by the host cap (saving precedes the scope/budget gates), so
        # a global orderBy window would drag the whole wave's results
        # into one partition at scale
        results = distributed_rank(
            new_saved, ("task_rank", "seq"), "save_order", start=next_save
        ).select(
            "method",
            "url",
            "postdata",
            "headers",
            "type",
            F.col("u.pattern").alias("pattern"),
            F.col("u.hostname").alias("hostname"),
            F.col("u.domain").alias("domain"),
            "is_target",
            F.lit(depth).alias("wave"),
            "save_order",
            "saved_key",
            "task_rank",
            "seq",
        ).cache()

        # --- scheduling stream: F11 scope + F13 method gates -------------
        gated = cands_t.filter(F.col("is_target") & FL.method_is_get())

        # depth limit (config extension): candidates from this wave
        # would enter the frontier at depth+1 — past the cap, the
        # whole scheduling stream is empty (saving above is untouched;
        # no seen/budget bookkeeping happens, matching the oracle's
        # never-created task). The literal-false filter lets Catalyst
        # collapse the entire scheduling subtree to an empty relation.
        if self.cfg.max_depth is not None and depth + 1 > self.cfg.max_depth:
            gated = gated.filter(F.lit(False))

        # --- A2: new-host index-page synthesis ---------------------------
        host_budget = self.store.read("host_budget")
        fresh_gated = gated.join(
            host_budget.filter(F.col("reqcount") > 0).select("hostname").withColumnRenamed(
                "hostname", "_h"
            ),
            F.col("u.hostname") == F.col("_h"),
            "left_anti",
        )
        synth = (
            fresh_gated.groupBy(
                F.col("u.hostname").alias("hostname"),
                F.col("u.index_page").alias("url"),
            )
            .agg(
                # the synthetic index task inherits the context of the
                # earliest candidate that triggered it
                F.min(F.struct("task_rank", "seq", "fetch_context")).alias("_at"),
            )
            .select(
                "url",
                F.col("_at.task_rank").alias("task_rank"),
                F.col("_at.seq").alias("seq"),
                F.lit(0).alias("synth_rank"),
                F.col("_at.fetch_context").alias("fetch_context"),
            )
        )
        synth = with_url_info(synth, "url")
        if self.cfg.slim_fold:
            # the synth frame is consumed twice below (slim fold input
            # + payload recovery); cache it so its groupBy exchange
            # runs once. Bounded: one row per fresh (host, index_page).
            synth = synth.cache()
        regular = gated.select(
            "url", "task_rank", "seq", F.lit(1).alias("synth_rank"),
            "fetch_context", "u",
        )
        stream = regular.unionByName(synth)

        # --- stateless filters (F1/F3, F7, F10) ---------------------------
        stream = stream.filter(FL.stateless_valid(self.cfg.blocklist))
        if self.cfg.url_block_keywords:  # RefinedWeb-style URL gate
            stream = stream.filter(FL.url_keyword_keep(
                "u.url", tuple(self.cfg.url_block_keywords),
                self.cfg.url_keyword_threshold,
            ))
        if self.robots_rules is not None:  # north_rule robots extension
            stream = robots_filter_wildcard(
                stream, self.robots_rules,
                host_col="u.hostname", path_col="u.path",
            )
        elif self.robots is not None:
            stream = robots_filter(stream, self.robots, host_col="u.hostname")

        # --- F8: committed seen_scanned anti-join --------------------------
        # slim_fold: only the fold's working set enters the hostname
        # exchange — the wide payload strings (url/domain/
        # fetch_context) are re-attached after admission from the
        # cached candidate frames (broadcast hash probe, no exchange).
        slim_cols = ["task_rank", "seq", "synth_rank"]
        payload_cols = [
            F.col("u.url").alias("url"),
            F.col("u.domain").alias("domain"),
            "fetch_context",
        ]
        if self.cfg.slim_fold:
            stream = stream.select(
                F.col("u.hostname").alias("hostname"),
                F.col("u.scan_key").alias("scan_key"),
                *slim_cols,
            )
        else:
            stream = stream.select(
                F.col("u.hostname").alias("hostname"),
                F.col("u.scan_key").alias("scan_key"),
                *payload_cols,
                *slim_cols,
            )
        # --- trap detection (extension, CrawlConfig.trap_min_urls) ------
        # Per-host candidate pressure vs distinct scan-keys over THIS
        # wave's stream, accumulated into host_pattern_stats; hosts
        # whose cumulative patterns/candidates ratio stays above the
        # threshold past trap_min_urls candidates are auto-added to the
        # runtime blocklist (Q7 semantics: their queued tasks drop at
        # the next wave's re-check and are recorded in blocked_tasks,
        # so remove_blocklist can reverse a wrong flag). Opt-in: costs
        # one extra aggregation job per wave (over the checkpointed
        # candidate set) plus a collect bounded by the flagged hosts.
        trap_stats = None
        trap_hosts: list = []
        if self.cfg.trap_min_urls:
            wave_ps = stream.groupBy("hostname").agg(
                F.count("*").alias("n_urls"),
                F.countDistinct("scan_key").alias("n_patterns"),
            )
            trap_stats = (
                self.store.read("host_pattern_stats")
                .unionByName(wave_ps)
                .groupBy("hostname")
                .agg(
                    F.sum("n_urls").alias("n_urls"),
                    F.sum("n_patterns").alias("n_patterns"),
                )
            ).cache()
            flagged = trap_stats.filter(
                (F.col("n_urls") >= self.cfg.trap_min_urls)
                & (
                    F.col("n_patterns")
                    > F.lit(float(self.cfg.trap_max_patterns_per_url))
                    * F.col("n_urls")
                )
            )
            trap_hosts = sorted(
                r["hostname"]
                for r in flagged.select("hostname").collect()
                if r["hostname"] not in self.cfg.blocklist
            )
            if trap_hosts:
                self.cfg.blocklist.extend(trap_hosts)

        n_part = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        # bucketed accumulated-state split (r5): after a compaction
        # the seen_scanned base snapshot is CLUSTERED BY (hostname,
        # scan_key) — the anti-join below then reads it exchange-free
        # and only the (broadcast-sized) post-compaction delta and the
        # wave's own candidates move. seen_base is None until the
        # first compaction (or after an unblock replace): identical
        # plan to before.
        seen_base, seen_delta = self.store.read_split("seen_scanned")
        filt_df = None
        if self.cfg.cuckoo_filter:
            # persistent cuckoo prefilter: probe the stored shards
            # (O(delta) maintenance below — no per-wave full-seen
            # rebuild), exact anti-join for the maybes; admission
            # re-establishes host partitioning like the bloom path.
            # copart probe: the shards stay distributed end to end.
            filt_df, filt_rows = self._seen_filter()
            shard_df = (
                filt_df
                if self.cfg.resolved_cuckoo_probe() == "copart"
                else None
            )
            if seen_base is not None:
                stream = anti_join_seen_cuckoo(
                    stream, seen_base, "scan_key",
                    filt_rows, self.cfg.bloom_shards, shard_df=shard_df,
                    host_col="hostname", seen_delta=seen_delta,
                )
            else:
                stream = anti_join_seen_cuckoo(
                    stream, seen_delta, "scan_key",
                    filt_rows, self.cfg.bloom_shards, shard_df=shard_df,
                )
            admitted = admit_wave(
                stream, host_budget, self.cfg.max_per_host,
                reduce_first=False, partitions=n_part,
            )
        elif self.cfg.use_bloom_prefilter:
            # bloom prefilter splits the stream (definite-new bypasses
            # the exact join), so host partitioning is re-established by
            # the admission fold afterwards: two candidate shuffles.
            stream = anti_join_seen(
                stream,
                self.store.read("seen_scanned"),
                "scan_key",
                use_bloom=True,
                shards=self.cfg.bloom_shards,
                fpp=self.cfg.bloom_fpp,
                probe=self.cfg.bloom_probe,
            )
            admitted = admit_wave(
                stream, host_budget, self.cfg.max_per_host,
                reduce_first=False, partitions=n_part,
            )
        elif self.cfg.salt_buckets:
            # skew path (north_rule): hot-host candidates salted into
            # S buckets; the anti-join keys on (host, bucket, key) and
            # the salted fold's wide phase on (host, bucket), so a hot
            # host spreads over S partitions at every exchange; the
            # exact merge fold then runs on ≤ S×(cap+2) rows per host.
            stream = anti_join_seen_copart(
                stream, self.store.read("seen_scanned"),
                "scan_key", "hostname", n_part,
                salt_buckets=self.cfg.salt_buckets,
            )
            admitted = admit_wave_salted(
                stream, host_budget, self.cfg.max_per_host,
                self.cfg.salt_buckets, n_part, bucket_col="_salt_b",
            )
        else:
            # scale path: the exact F8 anti-join leaves exchange
            # placement to the planner (broadcast while the seen set
            # is small; one (host, key) exchange per side against a
            # big seen — see anti_join_seen_copart's r4 plan audit);
            # the admission fold's windows then establish the host
            # partitioning they need. With a bucketed base snapshot
            # the base anti-join's seen side is satisfied off storage
            # (no exchange over accumulated state) and the delta
            # anti-join broadcasts; chaining two anti-joins equals one
            # anti-join against the union.
            if seen_base is not None:
                stream = anti_join_seen_copart(
                    stream, seen_base, "scan_key", "hostname", n_part,
                )
                if seen_delta is not None:
                    stream = anti_join_seen_copart(
                        stream, seen_delta, "scan_key", "hostname", n_part,
                    )
            else:
                stream = anti_join_seen_copart(
                    stream, seen_delta, "scan_key", "hostname", n_part,
                )
            admitted = admit_wave(
                stream, host_budget, self.cfg.max_per_host, reduce_first=False
            )
        admitted_raw = admitted.cache()  # rank-input cache barrier (see seed())
        admitted = assign_discovery_order(admitted_raw, start=next_order - 1).cache()

        if self.cfg.slim_fold:
            # payload recovery: broadcast the cap-bounded admitted
            # key-set onto the cached candidate frames. Unfiltered on
            # purpose — the inner join on the unique candidate id
            # (task_rank, seq, synth_rank) IS the membership test, so
            # re-running the stateless/robots filters here would be
            # wasted work.
            payload = gated.select(
                *payload_cols, "task_rank", "seq",
                F.lit(1).alias("synth_rank"),
            ).unionByName(
                synth.select(
                    *payload_cols, "task_rank", "seq",
                    F.lit(0).alias("synth_rank"),
                )
            )
            admitted_full = payload.join(
                F.broadcast(
                    admitted.select(
                        "hostname", "discovery_order", *slim_cols
                    )
                ),
                slim_cols,
            )
        else:
            admitted_full = admitted

        new_frontier = self._finalize_frontier(
            admitted_full.select(
                "url",
                "hostname",
                "domain",
                F.lit(depth + 1).alias("depth"),
                "discovery_order",
                "fetch_context",
            )
        )
        budget_delta = admitted.groupBy("hostname").agg(
            F.count("*").alias("reqcount")
        )
        new_budget = (
            host_budget.unionByName(budget_delta)
            .groupBy("hostname")
            .agg(F.sum("reqcount").alias("reqcount"))
        )

        # ONE summary action per wave: per-partition candidate lineage
        # (north_rule) + the scheduled/saved counts ride the same job —
        # the candidate total is Σ lineage rows, so the three counts
        # that used to be three jobs cost zero extra here. This first
        # action also materializes every cache (cands, cands_t,
        # results, admitted); the commit writes below then read cached
        # data only.
        def _tot(df, stage):
            return df.agg(F.count(F.lit(1)).alias("rows")).select(
                F.lit(stage).alias("stage"),
                F.lit(-1).alias("partition_id"),
                "rows",
            )

        summary = (
            cands.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .select(F.lit("candidates").alias("stage"), "partition_id", "rows")
            .unionByName(_tot(admitted, "scheduled"))
            .unionByName(_tot(results, "saved"))
        ).collect()
        n_sched = sum(r["rows"] for r in summary if r["stage"] == "scheduled")
        n_saved = sum(r["rows"] for r in summary if r["stage"] == "saved")
        n_cands = sum(r["rows"] for r in summary if r["stage"] == "candidates")
        metrics = self.spark.createDataFrame(
            self.spark.sparkContext.parallelize(
                [(depth, r["stage"], r["partition_id"], r["rows"]) for r in summary],
                1,
            ),
            SCHEMAS["fetch_metrics"],
        )

        appends = {
            "frontier": new_frontier,
            "seen_scanned": admitted.select("hostname", "scan_key"),
            "seen_saved": results.select("saved_key"),
            "results": results.drop("saved_key", "task_rank", "seq"),
            "fetch_metrics": metrics,
        }
        if dropped is not None:
            appends["blocked_tasks"] = dropped
        replaces = {"host_budget": new_budget}
        wave_meta_extra = {}
        if trap_stats is not None:
            replaces["host_pattern_stats"] = trap_stats
            if trap_hosts:
                conf = meta.get("config", self.cfg.to_meta())
                conf["blocklist"] = list(self.cfg.blocklist)
                wave_meta_extra["config"] = conf
        if filt_df is not None:
            # O(delta) filter maintenance: merge ONLY this wave's
            # admitted keys into the persisted shards (cap-bounded),
            # atomic with the seen_scanned append it mirrors
            replaces["seen_filter"] = apply_cuckoo_delta(
                filt_df, admitted.select("scan_key"), "scan_key",
                self.cfg.bloom_shards, self._cuckoo_cap_per_shard, op="add",
            )
        self.store.commit(
            appends=appends,
            replaces=replaces,
            meta={
                "next_depth": depth + 1,
                "next_order": next_order + n_sched,
                "next_save_order": next_save + n_saved,
                "last_scheduled": n_sched,
                **wave_meta_extra,
            },
        )
        for df in (
            cands_raw, cands, cands_t, new_saved, results, admitted_raw, admitted
        ):
            df.unpersist()
        if trap_stats is not None:
            trap_stats.unpersist()
        if ranked_tasks is not None:
            ranked_tasks.unpersist()
        if self.cfg.slim_fold:
            synth.unpersist()
        if self.cfg.compact_every and (depth + 1) % self.cfg.compact_every == 0:
            # bound the append-dir fan: periodic snapshot rewrite
            # (Iceberg rewrite_data_files), atomic like any commit
            self.store.compact(partitions=n_part)
        return {"scheduled": n_sched, "saved": n_saved, "candidates": n_cands}

    # ------------------------------------------------------------------
    # exports for parity checks / downstream consumers
    def crawl_order(self) -> DataFrame:
        return (
            self.store.read("frontier")
            .select("url", "depth", F.col("discovery_order").alias("rank"))
            .orderBy("rank")
        )

    def results(self) -> DataFrame:
        return self.store.read("results").orderBy("save_order")
