"""Runtime domain block (Q7) — CLI parity with the reference's
tools/block_domain.py:15-22, which pushes a dnsname onto the live
blocklist so the consumer-side re-check drops matching tasks from the
next wave on.

Usage: python tools/block_domain.py STATE_DIR DNSNAME [DNSNAME ...]
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
    args = ap.parse_args(argv)

    from tspider_spark.config import CrawlConfig
    from tspider_spark.session import get_spark
    from tspider_spark.sources.state import StateStore

    spark = spark or get_spark("block-domain", master="local[2]",
                               shuffle_partitions=2)
    store = StateStore(spark, args.state_dir)
    meta = store.meta()
    conf = meta.get("config", CrawlConfig().to_meta())
    blocklist = list(conf.get("blocklist", []))
    added = [d for d in args.dnsnames if d not in blocklist]
    conf["blocklist"] = blocklist + added
    store.commit(meta={"config": conf})
    print(f"blocked {len(added)} new domain(s); blocklist={conf['blocklist']}")
    return added


if __name__ == "__main__":
    main()
