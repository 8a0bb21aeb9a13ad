"""Result-store exports (K3-K6) — CLI parity with the reference's
mongoexport workflows (tools/extract_field_from_mongoexport.py:31-43,
tools/urls_for_pocsuite.py:28-41).

Usage:
  python tools/export_results.py STATE_DIR urls [--out FILE]
  python tools/export_results.py STATE_DIR fields --fields url,method,... [--out FILE]
  python tools/export_results.py STATE_DIR pocsuite [--out FILE]

Without --out, rows print to stdout (tab-separated, save_order /
operator order).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None, spark=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("state_dir")
    ap.add_argument("mode", choices=["urls", "fields", "pocsuite"])
    ap.add_argument("--fields", default="url")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from tspider_spark.operators import export as X
    from tspider_spark.session import get_spark
    from tspider_spark.sources.state import StateStore

    spark = spark or get_spark("export-results", master="local[2]",
                               shuffle_partitions=2)
    results = StateStore(spark, args.state_dir).read("results")
    if args.mode == "urls":
        out = X.export_urls(results.orderBy("save_order"))
    elif args.mode == "fields":
        out = X.export_fields(
            results.orderBy("save_order"), args.fields.split(",")
        )
    else:
        out = X.urls_for_pocsuite(results)

    rows = [
        "\t".join("" if v is None else str(v) for v in r) for r in out.collect()
    ]
    if args.out:
        Path(args.out).write_text("\n".join(rows) + ("\n" if rows else ""))
        print(f"{len(rows)} rows -> {args.out}")
    else:
        for line in rows:
            print(line)
    return rows


if __name__ == "__main__":
    main()
