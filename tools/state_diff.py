"""Snapshot diff: what changed between two committed versions of the
crawl state — the time-travel analytics face of the Iceberg-analog
StateStore (`sources/state.py`).

Usage:
  python tools/state_diff.py <state_dir> [--from V1] [--to V2]
      [--table T ...] [--sample N]

Prints one JSON line `STATE_DIFF {...}` with, per table:
  rows_from / rows_to / added   - row counts at each snapshot and the
                                  delta of rows present in V2 but not
                                  V1 (append tables: exactly the rows
                                  the intervening waves committed;
                                  replace tables: the new content)
  removed                       - rows present in V1 but not V2
                                  (nonzero only for replace tables or
                                  after compaction-with-dedupe)
  sample_added                  - up to --sample new rows (stringified)

Defaults: V2 = current version, V1 = V2 - 1, all tables present in
either manifest. Reference parity: the reference's Redis/Mongo state
has no history at all — inspecting "what did wave k add" requires
this store's snapshot log.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None, spark=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("state")
    ap.add_argument("--from", dest="v_from", type=int, default=None)
    ap.add_argument("--to", dest="v_to", type=int, default=None)
    ap.add_argument("--table", action="append", default=None)
    ap.add_argument("--sample", type=int, default=3)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    if spark is None:
        spark = SparkSession.builder.appName("tspider-state-diff").getOrCreate()

    from tspider_spark.sources.state import StateStore

    store = StateStore(spark, args.state)
    v_to = store.version if args.v_to is None else args.v_to
    v_from = (v_to - 1) if args.v_from is None else args.v_from

    import os

    from tspider_spark.sources.state import SCHEMAS, empty_df

    def tables_at(v):
        snap = os.path.join(store.root, f"manifest-v{v:06d}.json")
        if not os.path.exists(snap):  # v0 predates the snapshot log
            return set()
        with open(snap) as f:
            return set(json.load(f)["tables"])

    def read_at(t, v):
        snap = os.path.join(store.root, f"manifest-v{v:06d}.json")
        if not os.path.exists(snap):
            return empty_df(spark, SCHEMAS[t])
        return store.read(t, version=v)

    names = args.table or sorted(tables_at(v_from) | tables_at(v_to))
    out = {"from": v_from, "to": v_to, "tables": {}}
    for t in names:
        a = read_at(t, v_from)
        b = read_at(t, v_to)
        added = b.exceptAll(a)
        removed = a.exceptAll(b)
        n_added = added.count()
        entry = {
            "rows_from": a.count(),
            "rows_to": b.count(),
            "added": n_added,
            "removed": removed.count(),
        }
        if args.sample > 0 and n_added > 0:
            entry["sample_added"] = [
                str(tuple(r)) for r in added.limit(args.sample).collect()
            ]
        out["tables"][t] = entry
    print("STATE_DIFF " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
