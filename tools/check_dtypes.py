"""Strict dtype-parity sweep between each query's Spark result and its
DuckDB oracle, emulating the DRIVER's canonicalizer rather than the
lenient local one (tools/check_contract.py).

Why this exists: the driver hashes result frames with raw pandas
dtypes. In round 2, `paragraph_dedupe` matched value-for-value under
the lenient checker but failed the driver's hash because DuckDB's
sum(int) came back HUGEINT->float64 while Spark produced int64. This
tool catches that class BEFORE the driver does: for every oracle-backed
query it compares, per column, the pandas dtype of the Spark result
vs the oracle result at a small sf, and flags any kind mismatch
(int vs float, int32 vs int64, object vs numeric, decimal objects).

Usage: python tools/check_dtypes.py [sf_dir] [query ...]
Exit 1 if any mismatch.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_contract import TABLES  # noqa: E402


def dtype_tag(s: pd.Series) -> str:
    """A driver-hash-relevant dtype tag: exact numpy dtype for numeric
    columns, plus the python type of the first non-null cell for
    object columns (Decimal vs str vs bytes all hash differently)."""
    t = str(s.dtype)
    if s.dtype == object:
        nn = s.dropna()
        inner = type(nn.iloc[0]).__name__ if len(nn) else "empty"
        return f"object[{inner}]"
    return t


def sweep(spark, sf_dir: str, only: set | None = None) -> list:
    """Run the full both-sides dtype sweep; returns the list of
    mismatched query names (empty = clean). Importable so the pytest
    gate (tests/test_dtype_parity.py, TSPIDER_FULL_SWEEP=1) and the
    CLI share one implementation."""
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
            exp = con.execute(sql).df()
        except Exception as ex:
            bad.append(name)
            print(f"ERR  {name}: {str(ex)[:200]}")
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            bad.append(name)
            print(f"COLS {name}: {list(got.columns)} vs {list(exp.columns)}")
            continue
        mism = []
        for c in got.columns:
            gt, et = dtype_tag(got[c]), dtype_tag(exp[c])
            if gt != et:
                mism.append(f"{c}: spark={gt} oracle={et}")
        # NaN-vs-value presence differences also flip dtypes/hashes
        for c in got.columns:
            gn, en = int(got[c].isna().sum()), int(exp[c].isna().sum())
            if (gn == 0) != (en == 0):
                mism.append(f"{c}: null-count spark={gn} oracle={en}")
        if mism:
            bad.append(name)
            print(f"MISM {name}:")
            for m in mism:
                print(f"     {m}")
        else:
            print(f"ok   {name}")

    print("=" * 60)
    print("DTYPE MISMATCHES:", bad if bad else "none")
    return bad


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from tspider_spark.session import get_spark

    spark = get_spark("dtype-check", master="local[8]", shuffle_partitions=8)
    bad = sweep(spark, sf_dir, only)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
