"""Sequential golden oracle: a pure-Python reimplementation of the
reference scheduler semantics (single-consumer FIFO — the canonical
ordering, SURVEY.md §2.6 Q2), run over the same synthetic corpus.

This is deliberately the *naive* implementation — dicts, sets and
lists mutated one record at a time, mirroring the Redis/Mongo side
effects of ``redis_utils.py:149-196`` + ``producer.py:63-109`` — so
the distributed engine (windows, anti-joins, wave loop) is tested
against an independent encoding of the same semantics. Only the
leaf URL functions (``urlpure``) are shared; every scheduling decision
is re-derived here.

Simulated pipeline per FIFO task:
  consume: blocklist re-check (consumer.py:38) -> fetch (corpus dict
  lookup; miss == render failure) -> extract records (core.js rules,
  sequential) -> per result record (producer.proc_req):
  enrich -> saved-dedupe+store (F12/K1) -> scope gate (F11) -> method
  gate (F13) -> new-host index-page seed (A2) -> create_task
  (valid_task_url F1/F3 -> F7 -> F8 -> F9 -> F10, then side effects).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from tspider_spark.config import CrawlConfig
from tspider_spark.functions.urlpure import (
    UrlInfo,
    js_normalize,
    js_valid_scheme,
    parse_url,
)


@dataclass
class OracleResult:
    # (url, depth, rank) in exact FIFO enqueue order; rank is the
    # global discovery order (seeds included), depth the BFS level.
    crawl_order: list = field(default_factory=list)
    seen_scanned: set = field(default_factory=set)
    seen_saved: set = field(default_factory=set)
    host_budget: dict = field(default_factory=dict)
    whitelist: set = field(default_factory=set)
    # saved result docs in save order:
    # (method, url, postdata, type, pattern, hostname, domain, is_target)
    results: list = field(default_factory=list)
    fetched: list = field(default_factory=list)  # task urls in fetch order


def extract_records(doc_id: str, spans) -> list:
    """Reference per-page extraction, sequential (core.js + spider.py).

    Returns records ``(method, url, postdata, type)`` in the exact
    result-queue order: intercepted requests first (interception
    order), then static records (document order), in-page JSON dedupe
    within the static section, then the parse-time METHOD|url
    fingerprint keep-first (spider.py:118-122).
    """
    page_scheme = doc_id.split(":", 1)[0]
    requested = []
    statics = []
    static_seen = set()
    for kind, text, media_ref, offset in sorted(spans, key=lambda s: s[3]):
        if kind == "request":
            requested.append(("GET", text, "", "request"))
        elif kind in ("link", "media"):
            if not text or not js_valid_scheme(text) or len(text) >= 1024:
                continue
            rec = ("GET", js_normalize(text, page_scheme), "", "static")
            if rec not in static_seen:
                static_seen.add(rec)
                statics.append(rec)
        elif kind == "form":
            if " " not in (text or ""):
                continue
            method, rest = text.split(" ", 1)
            action, sep, qs = rest.partition("?")
            if not qs:
                continue
            rec = (method.upper(), js_normalize(action, page_scheme), qs, "static")
            if rec not in static_seen:
                static_seen.add(rec)
                statics.append(rec)
    out = []
    fps = set()
    for m, u, pd_, t in requested + statics:
        fp = (m.upper(), u)
        if fp in fps:
            continue
        fps.add(fp)
        out.append((m.upper(), u, pd_, t))
    return out


class ReferenceOracle:
    def __init__(
        self,
        docs,
        config: CrawlConfig | None = None,
        robots: dict | None = None,
        host_priorities: dict | None = None,
    ):
        """``robots``: {host: (disallow_prefixes, crawl_delay_ms)} —
        north_rule extension; None/empty preserves reference parity.
        ``host_priorities``: {hostname: int} for the authority-priority
        drain (cfg.priority="authority"): within each depth level,
        tasks process in (priority asc, enqueue order) — unranked
        hosts last, in enqueue order."""
        self.docs = {doc_id: spans for doc_id, spans in docs}
        self.cfg = config or CrawlConfig()
        self.res = OracleResult()
        self.blocklist = set(self.cfg.blocklist)
        self.robots = robots or {}
        self.host_priorities = host_priorities

    # --- redis_utils semantics ---------------------------------------

    def _is_blocked(self, u: UrlInfo) -> bool:  # F10
        return any(n in self.blocklist for n in u.block_names)

    def _is_target(self, u: UrlInfo) -> bool:  # F11
        key = u.domain if self.cfg.tld else u.hostname
        return key in self.res.whitelist

    def _valid_task_url(self, u: UrlInfo) -> bool:  # redis_utils.py:168-196
        if not u.valid or u.blocked:  # F1/F3
            return False
        if u.alicdn:  # F7
            return False
        if u.scan_key in self.res.seen_scanned:  # F8
            return False
        if self.res.host_budget.get(u.hostname, 0) > self.cfg.max_per_host:  # F9
            return False
        if self._is_blocked(u):  # F10
            return False
        if self.cfg.robots_enabled and u.hostname in self.robots:
            prefixes = self.robots[u.hostname][0]
            if any(u.path.startswith(p) for p in prefixes):
                return False
        return True

    def _create_task(self, u: UrlInfo, depth: int, add_whitelist: bool = False) -> bool:
        if not self._valid_task_url(u):
            return False
        rank = len(self.res.crawl_order)
        self.res.crawl_order.append((u.url, depth, rank))
        self._queue.append((u.url, depth))
        if add_whitelist:
            self.res.whitelist.add(u.domain if self.cfg.tld else u.hostname)
        self.res.seen_scanned.add(u.scan_key)
        self.res.host_budget[u.hostname] = self.res.host_budget.get(u.hostname, 0) + 1
        return True

    # --- producer.proc_req --------------------------------------------

    def _proc_record(self, rec, depth: int):
        method, urlstring, postdata, type_ = rec
        if not urlstring or not method:
            return
        u = parse_url(urlstring)
        if not u.valid:
            return
        target = self._is_target(u)
        saved_key = "{}-{}".format(method, u.pattern)  # T4
        if saved_key not in self.res.seen_saved:
            self.res.results.append(
                (method, urlstring, postdata, type_, u.pattern, u.hostname,
                 u.domain, target)
            )
            self.res.seen_saved.add(saved_key)
        if not target:
            return
        if method != "GET":
            return  # F13 (POST logged-unsupported, others error-logged)
        if self.cfg.max_depth is not None and depth > self.cfg.max_depth:
            return  # depth limit: saved above, never scheduled
        # A2 — new-host index page seeding (producer.py:101-103)
        if self.res.host_budget.get(u.hostname, 0) == 0:
            self._create_task(parse_url(u.index_page), depth)
        self._create_task(u, depth)

    # --- main loop ------------------------------------------------------

    def run(self, seeds, single_url_mode: bool = False) -> OracleResult:
        self._queue = []
        # seeding (tspider.py:82-95 / producer.create_task_from_file)
        for s in seeds:
            u = parse_url(s)
            if single_url_mode and (not u.valid or u.blocked):
                raise ValueError("not valid url: {}".format(s))
            if u.valid:
                self._create_task(u, 0, add_whitelist=True)
        if self.cfg.priority == "authority":
            self._drain_priority()
        else:
            # single-consumer FIFO drain
            qi = 0
            while qi < len(self._queue):
                self._process_task(*self._queue[qi])
                qi += 1
        return self.res

    def _process_task(self, task_url: str, depth: int):
        u = parse_url(task_url)
        if self._is_blocked(u):  # consumer.py:38 re-check
            return
        spans = self.docs.get(task_url)
        self.res.fetched.append(task_url)
        if spans is None:
            return  # render failure / 404: no results
        for rec in extract_records(task_url, spans):
            self._proc_record(rec, depth + 1)

    def _drain_priority(self):
        """Authority-priority drain: level-synchronous (FIFO is depth-
        ordered, so each depth is one contiguous queue run); within a
        level, process in (host priority asc, enqueue order) —
        children append to the next level as they are discovered."""
        prios = self.host_priorities or {}
        inf = float("inf")
        i0 = 0
        while i0 < len(self._queue):
            d = self._queue[i0][1]
            i1 = i0
            while i1 < len(self._queue) and self._queue[i1][1] == d:
                i1 += 1
            level = self._queue[i0:i1]
            order = sorted(
                range(len(level)),
                key=lambda k: (
                    prios.get(parse_url(level[k][0]).hostname, inf), k
                ),
            )
            for k in order:
                self._process_task(*level[k])
            i0 = i1
