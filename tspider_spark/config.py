"""Crawl configuration (reference: settings.py + CLI flags).

Defaults replicate the reference exactly:
- ``max_per_host`` = 100 with a strict ``>`` check, so up to 101 tasks
  per hostname are admitted (settings.py:22, redis_utils.py:188-190).
- ``tld`` = False: scope whitelist keyed by hostname; True keys it by
  registered (public-suffix) domain (redis_utils.py:129-147).
- ``robots`` is an extension beyond the reference (north_rule); an
  empty robots table preserves reference-parity behaviour.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CrawlConfig:
    tld: bool = False
    max_per_host: int = 100
    blocklist: list[str] = field(default_factory=list)
    # robots extension (A4 fixture); empty => reference parity
    robots_enabled: bool = False
    # frontier ordering (extension; reference is strictly FIFO/BFS):
    # "bfs" = discovery order within each depth (reference parity);
    # "authority" = within each depth, hosts drain in ascending
    # priority (e.g. PageRank rank via rank_hosts_by_score), ties and
    # unranked hosts in discovery order. Requires CrawlEngine(...,
    # host_priorities=df). Semantic config — round-trips through the
    # store meta so resume keeps the same ordering.
    priority: str = "bfs"
    # depth limit (north_star "depth limits"; the reference itself has
    # no depth concept, so None == unlimited == reference parity).
    # Semantics: results at any depth still SAVE; candidates whose
    # depth would exceed max_depth are never scheduled (no seen-set or
    # budget bookkeeping, exactly as if the task was never created).
    max_depth: int | None = None
    # crawler-trap auto-blocklist (extension; 0 = off = reference
    # parity): accumulate per-host candidate counts vs distinct
    # scan-key (pattern) counts across waves; a host with
    # >= trap_min_urls candidates whose patterns/candidates ratio
    # exceeds trap_max_patterns_per_url keeps minting NEW patterns
    # (session ids, calendars, faceted search) that defeat the
    # T2-keyed seen set — it is added to the runtime blocklist (Q7
    # path: queued tasks drop at the next wave's re-check, recorded in
    # blocked_tasks so remove_blocklist can restore them if the flag
    # was wrong).
    trap_min_urls: int = 0
    trap_max_patterns_per_url: float = 0.9
    # URL keyword gate (RefinedWeb §G.1-style; empty = off = reference
    # parity): candidates whose lowercased URL scores >=
    # url_keyword_threshold (2 per whole-word keyword hit, 1 per
    # substring-only hit) are dropped in the stateless filter chain —
    # before any stateful bookkeeping, exactly like F1/F7.
    url_block_keywords: tuple = ()
    url_keyword_threshold: int = 2
    # tracking-param canonicalization (extension; False = reference
    # parity — the reference's T2 pattern key absorbs utm_ params into
    # the DEDUPE key but still schedules the decorated URL): when on,
    # candidate URLs lose utm_*/fbclid/gclid/... query params before
    # derivation, so decorated links collapse to one frontier task.
    strip_tracking: bool = False
    # performance knobs
    use_bloom_prefilter: bool = False
    bloom_shards: int = 8
    bloom_fpp: float = 0.01
    # "broadcast": driver-collected shards replicated to executors
    # (seen sets up to ~10^9 keys); "copart": co-partitioned shard
    # join — nothing collected or replicated, the 10^10 regime
    bloom_probe: str = "broadcast"
    # persistent cuckoo seen-filter (takes precedence over
    # use_bloom_prefilter): shards live in the state store, each wave
    # merges only its admitted keys (O(delta) vs the bloom's per-wave
    # full-seen rebuild), and blocklist removal can DELETE forgotten
    # keys (remove_blocklist) — the one thing a bloom cannot do.
    cuckoo_filter: bool = False
    # total key capacity provisioned across the cuckoo shards
    # (~2.6 bytes/key of table); shard count is bloom_shards. At
    # 10^10 keys: ~26 GB total -> 256+ shards with the copart probe.
    cuckoo_capacity: int = 1 << 22
    # "broadcast": the persisted shards are collected + replicated to
    # executors each wave (fine while the whole filter fits driver
    # memory); "copart": shards stay a DataFrame and candidates probe
    # them via a co-partitioned cogroup — NOTHING is ever collected to
    # the driver, the 10^10-key / ~26 GB-filter regime (r3 verdict
    # finding #4); "auto" (default, r5): resolve by the provisioned
    # filter size — copart once ~2.6 B/key x cuckoo_capacity exceeds
    # cuckoo_broadcast_max_bytes, broadcast below it. Copart is both
    # the measured winner at 10M keys (3.1 s vs 5.4 s broadcast,
    # BENCH_r04) and the only regime that survives 10^10, so the
    # scale-safe mode is now what a default-config engine runs;
    # broadcast stays an explicit opt-in for tiny crawls.
    cuckoo_probe: str = "auto"
    # "auto" threshold: above this many provisioned filter bytes the
    # probe goes copart (default 8 MB ~ 3.2M keys of capacity — well
    # below the 10M-key point where copart already wins outright)
    cuckoo_broadcast_max_bytes: int = 8 << 20
    # eagerly localCheckpoint the wave's candidate set instead of
    # caching it: truncates the fetch->extract->url-derivation lineage
    # so the ~200 downstream DataFrame ops analyze against a leaf
    # rather than re-walking (and, through the hybrid union, re-
    # DOUBLING) the full subtree — measured to dominate wave latency
    # driver-side. Recovery note: checkpoint loss (executor death)
    # fails the wave job; the per-wave atomic commit makes a wave
    # re-run from committed state exact, so nothing is lost.
    truncate_plan: bool = True
    # rewrite append-only state tables into one compact, key-laid-out
    # snapshot every N waves (0 = off) — bounds the per-wave read fan
    # of seen_scanned/frontier at long crawl horizons (the Iceberg
    # analog is rewrite_data_files maintenance). Default ON every 8
    # waves (r5): the rewrite is also what BUCKETS seen_scanned on the
    # anti-join keys, making the accumulated-state exchange disappear
    # from every subsequent wave plan (sources/state.py BUCKET_LAYOUT)
    # — the scale-safe layout should be what a default-config engine
    # converges to, not an opt-in. Crawls shorter than 8 waves never
    # pay the rewrite.
    compact_every: int = 8
    # skew path: salt each host's candidates into N buckets for the
    # seen anti-join + admission fold (0 = off). Exact either way
    # (tests/test_schedule_modes.py, test_crawl_golden.py).
    salt_buckets: int = 0
    # pre-reduce candidates to first-occurrence per (host, scan_key,
    # synth) before the budget window; exact (see operators/schedule.py)
    # and acts as the map-side combine for hot hosts.
    reduce_first: bool = True
    # narrow the admission-fold exchange: the seen anti-join + budget
    # fold shuffle ONLY (hostname, scan_key, order keys) — url/domain/
    # fetch_context (the wide strings, ~50% of row bytes) are
    # recovered AFTER admission by broadcast-joining the (tiny,
    # cap-bounded) admitted key-set back onto the cached candidate
    # frame: a map-side hash probe, no exchange. Exact (same fold
    # algebra on the same keys; (task_rank, seq, synth_rank) is a
    # unique candidate id). Regime: admitted-per-wave must stay
    # broadcast-sized (≤ active_hosts × (cap+1) rows — tens of MB even
    # at 10^6 active hosts); disable for unbounded caps.
    #
    # DEFAULT OFF — measured a 1.9x aggregate-CPU regression on the
    # 24M-candidate bench with local (in-memory) shuffle: the payload
    # recovery re-scans the cached candidate frame and rebuilds +
    # broadcasts the admitted set, which costs far more than the
    # ~70 B/row of url string it keeps out of the exchange (event-log
    # A/B at 32 cores: 3414 vs 1796 CPU-s for identical output; wall
    # 200.8k vs 294.3k URLs/s same-window). The knob exists for
    # network-shuffle clusters where shuffled bytes are the scarce
    # resource and a third map-side scan is cheap; exactness is
    # parity-tested either way.
    slim_fold: bool = False
    shuffle_partitions: int = 32
    max_waves: int | None = None

    def resolved_cuckoo_probe(self) -> str:
        """The effective probe regime: "auto" picks copart when the
        provisioned filter (~2.6 bytes per key of cuckoo_capacity)
        would exceed cuckoo_broadcast_max_bytes, else broadcast.
        Explicit "broadcast"/"copart" are honored as-is."""
        if self.cuckoo_probe != "auto":
            return self.cuckoo_probe
        approx_bytes = int(self.cuckoo_capacity * 2.6)
        return (
            "copart"
            if approx_bytes > self.cuckoo_broadcast_max_bytes
            else "broadcast"
        )

    def to_meta(self) -> dict:
        return {
            "tld": self.tld,
            "max_per_host": self.max_per_host,
            "blocklist": list(self.blocklist),
            "robots_enabled": self.robots_enabled,
            "priority": self.priority,
            "max_depth": self.max_depth,
            "trap_min_urls": self.trap_min_urls,
            "trap_max_patterns_per_url": self.trap_max_patterns_per_url,
            "url_block_keywords": list(self.url_block_keywords),
            "url_keyword_threshold": self.url_keyword_threshold,
            "strip_tracking": self.strip_tracking,
            # persisted so a resume can detect a shard-layout change:
            # keys hash to shards modulo bloom_shards, so probing a
            # filter persisted under a different count yields false
            # negatives that BYPASS the exact anti-join (ADVICE r4)
            "bloom_shards": self.bloom_shards,
        }

    @staticmethod
    def from_meta(meta: dict) -> "CrawlConfig":
        return CrawlConfig(
            tld=bool(meta.get("tld", False)),
            max_per_host=int(meta.get("max_per_host", 100)),
            blocklist=list(meta.get("blocklist", [])),
            robots_enabled=bool(meta.get("robots_enabled", False)),
            priority=str(meta.get("priority", "bfs")),
            max_depth=(
                int(meta["max_depth"])
                if meta.get("max_depth") is not None else None
            ),
            trap_min_urls=int(meta.get("trap_min_urls", 0)),
            trap_max_patterns_per_url=float(
                meta.get("trap_max_patterns_per_url", 0.9)
            ),
            url_block_keywords=tuple(meta.get("url_block_keywords", ())),
            url_keyword_threshold=int(meta.get("url_keyword_threshold", 2)),
            strip_tracking=bool(meta.get("strip_tracking", False)),
            bloom_shards=int(meta.get("bloom_shards", 8)),
        )
