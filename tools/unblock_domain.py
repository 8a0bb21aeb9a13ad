"""Runtime domain unblock — the inverse of tools/block_domain.py.

The reference has no unblock tool: a task its consumer re-check
(consumer.py:38) drops stays in the Redis url_scanned set forever.
This extension removes the dnsname from the live blocklist, deletes
the dropped tasks' keys from the seen set (cuckoo-shard delete when
the store carries a persistent seen_filter, exact-table rewrite
always), and re-admits them through the normal admission fold.

Usage: python tools/unblock_domain.py STATE_DIR DNSNAME [DNSNAME ...]
       [--no-readmit]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None, spark=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("state_dir")
    ap.add_argument("dnsnames", nargs="+")
    ap.add_argument(
        "--no-readmit", action="store_true",
        help="only forget the dropped tasks' seen-set keys; do not "
        "re-insert them (they re-admit if a future wave rediscovers them)",
    )
    args = ap.parse_args(argv)

    from tspider_spark.config import CrawlConfig
    from tspider_spark.plans.crawl import CrawlEngine
    from tspider_spark.session import get_spark
    from tspider_spark.sources.state import StateStore

    spark = spark or get_spark("unblock-domain", master="local[2]",
                               shuffle_partitions=2)
    store = StateStore(spark, args.state_dir)
    cfg = CrawlConfig.from_meta(store.meta().get("config", {}))
    # the cuckoo flag is a perf knob (not round-tripped through meta):
    # infer it from whether the store carries a persistent filter
    cfg.cuckoo_filter = bool(store.manifest()["tables"].get("seen_filter"))
    # the engine's documents table is only used by wave(), not by
    # remove_blocklist — a placeholder satisfies the constructor
    docs = spark.createDataFrame([], "doc_id string")
    engine = CrawlEngine(spark, docs, args.state_dir, config=cfg)
    total = 0
    for d in args.dnsnames:
        total += engine.remove_blocklist(d, readmit=not args.no_readmit)
    print(
        f"unblocked {len(args.dnsnames)} domain(s), re-admitted {total} "
        f"task(s); blocklist={cfg.blocklist}"
    )
    return total


if __name__ == "__main__":
    main()
