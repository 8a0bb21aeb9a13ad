"""Local emulation of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle at a given sf,
compare row count + column set + order-insensitive values.

Usage: python tools/check_contract.py [--json OUT.json] [sf_dir] [query ...]

With --json, also writes a CORRECTNESS_rN-shaped file: one object per
query with rows_match/schema_match/hash_match (hash = value-for-value
equality after order-insensitive normalization), spark_rows,
oracle_rows, err. Used to record the local verdict for queries past
the driver's 50-query window.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        elif str(pdf[c].dtype).startswith("decimal") or pdf[c].dtype.kind == "O":
            pdf[c] = pdf[c].astype(float).round(6)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry
    from tspider_spark.session import get_spark

    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    report: dict[str, dict] = {}

    def rec(name, **kw):
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        row.update(kw)
        report[name] = row

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            rec(name, err=f"spark error: {str(ex)[:300]}")
            print(f"FAIL {name}: spark error: {str(ex)[:300]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only, {len(got)} rows "
                  f"({time.time()-t0:.1f}s)")
            rec(name, rows_match=len(got) > 0 or name == "noop",
                spark_rows=len(got))
            if len(got) == 0 and name != "noop":
                print(f"     WARNING: zero rows from {name}")
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as ex:
            failures.append(name)
            rec(name, err=f"duckdb error: {str(ex)[:300]}")
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            continue
        g, e = normalize(got), normalize(exp)
        if len(g) != len(e):
            failures.append(name)
            rec(name, rows_match=False, spark_rows=len(g), oracle_rows=len(e))
            print(f"FAIL {name}: rows spark={len(g)} duckdb={len(e)}")
            continue
        if list(g.columns) != list(e.columns):
            failures.append(name)
            rec(name, rows_match=True, schema_match=False,
                spark_rows=len(g), oracle_rows=len(e))
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}")
            continue
        # decimal→float alignment
        for c in g.columns:
            if g[c].dtype != e[c].dtype:
                try:
                    g[c] = g[c].astype(float).round(6)
                    e[c] = e[c].astype(float).round(6)
                except (ValueError, TypeError):
                    g[c] = g[c].astype(str)
                    e[c] = e[c].astype(str)
        g = g.sort_values(list(g.columns)).reset_index(drop=True)
        e = e.sort_values(list(e.columns)).reset_index(drop=True)
        if not g.equals(e):
            diff = (g != e).any(axis=1)
            failures.append(name)
            rec(name, rows_match=True, schema_match=True, hash_match=False,
                spark_rows=len(g), oracle_rows=len(e))
            print(f"FAIL {name}: value mismatch, first diffs:")
            print(pd.concat([g[diff].head(3), e[diff].head(3)], keys=["spark", "duckdb"]))
        else:
            rec(name, rows_match=True, schema_match=True, hash_match=True,
                spark_rows=len(g), oracle_rows=len(e))
            print(f"ok   {name}: {len(g)} rows match ({time.time()-t0:.1f}s)")

    print("=" * 60)
    print("FAILURES:", failures if failures else "none")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": report}, f, indent=1)
        print(f"wrote {json_out} ({len(report)} queries)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
