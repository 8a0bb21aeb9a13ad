"""spark-submit entry point for the crawl engine (north_rule: "runs
via spark-submit --py-files on multi-executor clusters").

Usage (see tools/run_crawl_submit.sh for the packaged invocation):

    spark-submit --py-files tspider_spark.zip \
        submit_crawl.py --documents <parquet dir or 'synthetic'> \
        --seeds <url> [<url> ...] --state <dir> \
        [--max-waves N] [--max-per-host N] [--tld] [--resume]
        [--strip-tracking] [--url-block-keywords [kw ...]]
        [--robots-bodies DIR] [--sitemap-bodies DIR]
        [--discover-sitemaps] [--host-priorities DIR]
        [--sitemap-rank-date YYYY-MM-DD] [--sitemap-top-k K]

On a real cluster the same command takes --master yarn/k8s etc.; the
engine itself is master-agnostic (everything is DataFrame ops against
the committed state store). --resume restarts from the last committed
wave snapshot (Q5) with no other arguments needed — config is
restored from the store's metadata.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None, stop_session=True):
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True,
                    help="parquet dir with (doc_id, spans) or 'synthetic'")
    ap.add_argument("--seeds", nargs="*", default=[])
    ap.add_argument("--seeds-file", default=None)
    ap.add_argument("--state", required=True)
    ap.add_argument("--max-waves", type=int, default=None)
    ap.add_argument("--max-per-host", type=int, default=100)
    ap.add_argument("--max-depth", type=int, default=None,
                    help="deepest frontier level to schedule (results "
                         "still save at any depth); default unlimited")
    ap.add_argument("--tld", action="store_true")
    ap.add_argument("--cookie-file", default=None,
                    help="auth context for every seed (reference "
                         "tspider.py:32): the file's content hash becomes "
                         "the crawl's fetch_context; documents carrying a "
                         "matching ctx column render their authed variants")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the last committed snapshot")
    ap.add_argument("--strip-tracking", action="store_true",
                    help="canonicalize candidate URLs by stripping "
                         "utm_*/fbclid/gclid/... tracking params before "
                         "derivation (decorated links collapse to one "
                         "frontier task; off = reference parity)")
    ap.add_argument("--url-block-keywords", nargs="*", default=None,
                    help="enable the RefinedWeb-style URL keyword gate "
                         "with these keywords (pass with no values to "
                         "use the built-in default list)")
    ap.add_argument("--robots-bodies", default=None,
                    help="parquet dir with (host, body): raw robots.txt "
                         "per host, parsed (parse_robots) and enforced "
                         "for disallow scoping + crawl-delay pacing")
    ap.add_argument("--robots-precedence", action="store_true",
                    help="evaluate robots with full RFC 9309 semantics "
                         "(Allow precedence + * / trailing-$ wildcards) "
                         "instead of the disallow-prefix summary")
    ap.add_argument("--sitemap-bodies", default=None,
                    help="parquet dir with (host, body): sitemap XML/"
                         "text bodies; non-index <loc> URLs become "
                         "seeds (in addition to --seeds/--seeds-file)")
    ap.add_argument("--discover-sitemaps", action="store_true",
                    help="with --robots-bodies and --sitemap-bodies: "
                         "only seed from sitemaps that robots.txt "
                         "actually declares (RFC 9309 Sitemap: lines) "
                         "— the robots->sitemap->seeds discovery loop")
    ap.add_argument("--sitemap-rank-date", default=None,
                    help="with --sitemap-bodies: rank sitemap seeds by "
                         "<priority> damped with <lastmod> staleness "
                         "relative to this YYYY-MM-DD reference date "
                         "(sitemap_seed_rank) and seed in score order "
                         "instead of sorted-URL order — high-priority "
                         "fresh URLs get the earliest discovery ranks")
    ap.add_argument("--sitemap-top-k", type=int, default=3,
                    help="with --sitemap-rank-date: per-host seed cap "
                         "(protocol files carry up to 50k URLs; only "
                         "the top-k per host enter the frontier)")
    ap.add_argument("--host-priorities", default=None,
                    help="parquet dir with (hostname, priority) enabling "
                         "authority-priority frontier ordering "
                         "(cfg.priority='authority'); required again on "
                         "--resume of an authority-mode crawl — the mode "
                         "round-trips via store meta, the table is an "
                         "input like --documents")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # spark-submit owns master/conf; only fill gaps for bare local runs
    spark = SparkSession.builder.appName("tspider-crawl").getOrCreate()

    from tspider_spark.config import CrawlConfig
    from tspider_spark.plans.crawl import CrawlEngine
    from tspider_spark.sources.state import StateStore

    if args.documents == "synthetic":
        from tspider_spark.sources.corpus import (
            CorpusSpec,
            corpus_to_spark,
            generate_corpus,
        )

        docs, default_seeds = generate_corpus(
            CorpusSpec(seed=42, n_domains=3, hosts_per_domain=2)
        )
        documents = corpus_to_spark(spark, docs)
        seeds = args.seeds or default_seeds
    else:
        documents = spark.read.parquet(args.documents)
        seeds = args.seeds

    host_priorities = (
        spark.read.parquet(args.host_priorities)
        if args.host_priorities else None
    )
    robots = None
    robots_rules = None
    if args.robots_bodies:
        from tspider_spark.operators.robots import (
            parse_robots,
            parse_robots_rules,
        )

        bodies = spark.read.parquet(args.robots_bodies)
        robots = parse_robots(bodies)
        if args.robots_precedence:
            # full RFC 9309: Allow precedence + */$ wildcards
            robots_rules = parse_robots_rules(bodies)
    if args.resume:
        cfg = CrawlConfig.from_meta(
            StateStore(spark, args.state).meta().get("config", {})
        )
        eng = CrawlEngine(spark, documents, args.state, cfg, robots=robots,
                          host_priorities=host_priorities,
                          robots_rules=robots_rules)
    else:
        kw: tuple = ()
        if args.url_block_keywords is not None:
            from tspider_spark.operators.filters import (
                DEFAULT_URL_BLOCK_KEYWORDS,
            )

            kw = (
                tuple(args.url_block_keywords)
                or DEFAULT_URL_BLOCK_KEYWORDS
            )
        cfg = CrawlConfig(
            tld=args.tld, max_per_host=args.max_per_host,
            max_depth=args.max_depth,
            robots_enabled=robots is not None,
            priority="authority" if host_priorities is not None else "bfs",
            strip_tracking=args.strip_tracking,
            url_block_keywords=kw,
        )
        eng = CrawlEngine(spark, documents, args.state, cfg, robots=robots,
                          host_priorities=host_priorities,
                          robots_rules=robots_rules)
        ctx = ""
        if args.cookie_file:
            import hashlib

            with open(args.cookie_file, "rb") as f:
                ctx = "cookie:" + hashlib.md5(f.read()).hexdigest()[:12]
        if args.sitemap_bodies:
            from tspider_spark.operators.robots import parse_sitemap

            bodies = spark.read.parquet(args.sitemap_bodies)
            declared = None
            if args.discover_sitemaps and args.robots_bodies:
                from tspider_spark.operators.robots import (
                    robots_sitemap_urls,
                )

                declared = robots_sitemap_urls(
                    spark.read.parquet(args.robots_bodies)
                ).select("host").distinct()
            if args.sitemap_rank_date:
                # priority-ranked seeding: <priority>/<lastmod> order
                # the frontier's discovery ranks (total order: score
                # desc, url asc — replay-deterministic)
                from pyspark.sql import functions as F

                from tspider_spark.operators.robots import (
                    parse_sitemap_entries,
                    sitemap_seed_rank,
                )

                ent = parse_sitemap_entries(bodies)
                if declared is not None:
                    ent = ent.join(declared, "host", "left_semi")
                ranked = sitemap_seed_rank(
                    ent, ref_date=args.sitemap_rank_date,
                    top_k=args.sitemap_top_k,
                )
                extra = [
                    r["url"]
                    for r in ranked.orderBy(
                        F.col("score").desc(), F.col("url").asc()
                    ).collect()
                ]
            else:
                sm = parse_sitemap(bodies)
                if declared is not None:
                    sm = sm.join(declared, "host", "left_semi")
                extra = sorted(
                    r["url"]
                    for r in sm.filter(~sm["is_index"]).select("url")
                    .distinct().collect()
                )  # seed lists are small/one-shot; order pinned for replay
            seen_seeds = set(seeds)
            seeds = list(seeds) + [u for u in extra if u not in seen_seeds]
        if args.seeds_file:
            eng.seed_from_text_file(args.seeds_file, fetch_context=ctx)
        else:
            seeds_df = spark.createDataFrame(
                [(s, i, ctx) for i, s in enumerate(seeds)],
                "url string, seed_order int, fetch_context string",
            )
            eng.seed(seeds_df)

    stats = eng.run(max_waves=args.max_waves)
    order_head = [
        (r["url"], r["depth"], r["rank"])
        for r in eng.crawl_order().limit(5).collect()
    ]
    print("CRAWL_RESULT " + json.dumps({
        "stats": stats,
        "store_version": eng.store.version,
        "crawl_order_head": order_head,
    }))
    if stop_session:  # keep alive for in-process callers (tests)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
