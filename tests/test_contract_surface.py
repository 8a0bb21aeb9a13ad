"""Driver-contract hygiene gate (VERDICT r2 #8): every queries()
output column must be a scalar — the driver's pandas canonicalizer
sorts result frames column-wise and cannot factorize list/map/struct
cells (the r2 `robots_parse`/`gopher_filter` ERR class). This test
walks the full contract surface so that class of regression cannot
recur, and pins the queries()/oracle_sql() key agreement.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

# wrappers that run engine jobs (not just build a plan) on call —
# still checked, just listed so a slow run is attributable
_RUNS_JOBS = {"crawl_full_run", "authority_wave_order"}


def test_queries_and_oracles_agree():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    # every oracle key must have a query; the (documented) rows-only
    # exceptions are the only queries allowed to lack an oracle
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"crawl_full_run", "media_decode"}


def test_all_query_outputs_are_scalar_columns(spark):
    qs = entry.queries()
    bad = {}
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        nested = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nested:
            bad[name] = nested
    assert not bad, f"non-scalar output columns crash the driver: {bad}"


def test_bench_list_is_a_subset_of_the_contract():
    # a bench entry without a queries() backing would crash the
    # driver's per-round bench run
    import bench

    qs = set(entry.queries())
    missing = [n for n in bench.BENCH_QUERIES if n not in qs]
    assert not missing, f"bench names without contract queries: {missing}"
