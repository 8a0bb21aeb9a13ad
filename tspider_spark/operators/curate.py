"""Training-data curation: deterministic sampling.

A 100 TB corpus is never trained on wholesale — pipelines draw
per-stratum samples (by language, source, quality band) with rates
set by a data recipe. The sampler here is hash-based rather than
RNG-based: keep(doc) depends only on (doc id, salt), so it is
reproducible across runs, engines, cluster sizes and partitionings,
composes with incremental ingestion (a doc's fate never changes as
the corpus grows), and is exactly expressible in ANSI SQL for the
DuckDB oracle (the same md5-derived uniform the MinHash/SimHash
operators use for portability).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60 portable bits (md5-hex[0:15]) -> uniform in [0, 1)
_DENOM = float(1 << 60)


def hash_uniform(col, salt: str = "") -> Column:
    """Deterministic uniform in [0,1) from a key column: bigint of
    md5(salt || ':' || key) hex[0:15] / 2^60. Engine-portable (DuckDB:
    ('0x' || substring(md5(...),1,15))::BIGINT / 2^60)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h / F.lit(_DENOM)


def sample_by_hash(
    df: DataFrame,
    rates: dict,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Stratified deterministic sample: keep a row iff its hash-uniform
    is below its stratum's rate. ``rates``: {stratum_value: rate}.
    With ``stratum_col=None`` the single ``default_rate`` applies to
    every row. Pure projection + filter — no shuffle, no RNG state,
    trivially pushed below wide operators by Catalyst."""
    u = hash_uniform(F.col(id_col), salt)
    if stratum_col is None:
        rate = F.lit(default_rate)
    else:
        rate = F.lit(default_rate)
        for k, v in sorted(rates.items()):
            rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    return df.withColumn("_u", u).filter(F.col("_u") < rate).drop("_u")
