"""Rebuild the saved-set from the committed results (S6) — CLI parity
with the reference's tools/build_redis_cache.py:23-30, which replays
mongo result rows into the Redis saved-cache after a cache loss.

Usage: python tools/rebuild_seen_cache.py STATE_DIR

Replaces the store's ``seen_saved`` table with the distinct
'{method}-{pattern}' keys derivable from ``results`` (atomic commit).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None, spark=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("state_dir")
    args = ap.parse_args(argv)

    from tspider_spark.operators.export import rebuild_seen_saved
    from tspider_spark.session import get_spark
    from tspider_spark.sources.state import StateStore

    spark = spark or get_spark("rebuild-seen", master="local[2]",
                               shuffle_partitions=2)
    store = StateStore(spark, args.state_dir)
    rebuilt = rebuild_seen_saved(store.read("results")).cache()
    n = rebuilt.count()
    store.commit(replaces={"seen_saved": rebuilt})
    rebuilt.unpersist()
    print(f"seen_saved rebuilt: {n} keys")
    return n


if __name__ == "__main__":
    main()
