"""Dtype-parity gate (VERDICT r4 #2/#7): the driver's result hash is
dtype-sensitive, and twice now (r2 `paragraph_dedupe`, r4
`suffix_array`) a value-correct query went driver-red because a DuckDB
windowed integer sum came back HUGEINT -> pandas float64 while Spark
emitted int64. `tools/check_dtypes.py` catches the class but was never
in any gate — this wires it in, two tiers:

1. ALWAYS-ON kind gate: execute every DuckDB oracle at sf0.001 (all
   ~146 run in <10 s) and compare each column's pandas KIND (int /
   float / bool / datetime / decimal / object) against the kind the
   query's lazy Spark schema will produce under Arrow toPandas. No
   Spark jobs — the plan's schema is enough, and both recorded
   driver-red bugs were oracle-side kind flips on null-free columns,
   which this detects exactly.
2. FULL both-sides sweep (Spark executed too, widths + null-presence
   included) behind TSPIDER_FULL_SWEEP=1 — the pre-driver checklist
   step; its clean output is recorded in-repo (DTYPES_SWEEP_r5.txt).
"""

from __future__ import annotations

import os
from decimal import Decimal

import duckdb
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry
from tools.check_contract import TABLES

SF_DIR = "/root/testdata/sf0.001"


def _spark_kind(dt) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "datetime"
    return "object"  # string/binary/nested


def _pandas_kind(s) -> str:
    k = s.dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    if k == "O":
        nn = s.dropna()
        if len(nn) and isinstance(nn.iloc[0], Decimal):
            return "decimal"
        return "object"
    return k


def test_oracle_kinds_match_spark_schema(spark):
    """The r2/r4 driver-red class: an oracle column whose pandas KIND
    diverges from what Spark's schema will emit. int-vs-float is
    flagged only when the oracle column is null-free (a NULL-bearing
    int column legitimately floats on BOTH sides under Arrow, which
    only the full sweep can adjudicate)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    qs = entry.queries()
    bad = {}
    for name, sql in entry.oracle_sql().items():
        exp = con.execute(sql).df()
        schema = {f.name: _spark_kind(f.dataType) for f in qs[name](spark, SF_DIR).schema.fields}
        if set(exp.columns) != set(schema):
            bad[name] = f"columns {sorted(exp.columns)} vs {sorted(schema)}"
            continue
        for c in exp.columns:
            ok_, ek = schema[c], _pandas_kind(exp[c])
            if ok_ == ek:
                continue
            has_nulls = bool(exp[c].isna().any())
            if {ok_, ek} == {"int", "float"} and has_nulls:
                continue  # Arrow floats nullable ints on both sides
            if ek == "object" and not len(exp[c].dropna()):
                continue  # all-NULL oracle column carries no kind
            bad.setdefault(name, []).append(
                f"{c}: spark={ok_} oracle={ek}"
            )
    assert not bad, f"oracle-vs-spark dtype KIND mismatches: {bad}"


@pytest.mark.skipif(
    not os.environ.get("TSPIDER_FULL_SWEEP"),
    reason="full both-sides dtype sweep: pre-driver checklist step "
    "(TSPIDER_FULL_SWEEP=1); clean output recorded in-repo",
)
def test_full_dtype_sweep(spark):
    from tools.check_dtypes import sweep

    assert sweep(spark, SF_DIR) == []
