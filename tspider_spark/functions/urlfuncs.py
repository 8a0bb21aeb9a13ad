"""Vectorized (Arrow-batched) URL derivation UDFs.

The reference materializes a URL value object per record in Python
(url.py:30-138). Here the whole projection T1-T8 runs as ONE
struct-returning pandas UDF per Arrow batch: each unique URL in the
batch is parsed once, then the derived columns are broadcast back to
the batch with vectorized pandas reindexing. This is the only Python
hop in the scheduling pipeline — everything else (extraction,
filters, dedupe windows, budget windows) stays JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from tspider_spark.functions.urlpure import URL_FIELDS, parse_url

URL_STRUCT = StructType(
    [
        StructField("valid", BooleanType()),
        StructField("url", StringType()),
        StructField("scheme", StringType()),
        StructField("netloc", StringType()),
        StructField("hostname", StringType()),
        StructField("domain", StringType()),
        StructField("path", StringType()),
        StructField("ext", StringType()),
        StructField("querystring", StringType()),
        StructField("pattern", StringType()),
        StructField("scan_key", StringType()),
        StructField("index_page", StringType()),
        StructField("blocked", BooleanType()),
        StructField("alicdn", BooleanType()),
        StructField("block_names", ArrayType(StringType())),
    ]
)


def _derive_batch(s: pd.Series) -> pd.DataFrame:
    """Parse each *unique* URL once, then reindex over the batch."""
    vals = s.fillna("")
    uniq = pd.Index(vals.unique())
    parsed = pd.DataFrame(
        [parse_url(u) for u in uniq], columns=URL_FIELDS, index=uniq
    )
    out = parsed.reindex(vals.values)
    out.reset_index(drop=True, inplace=True)
    return out


@pandas_udf(URL_STRUCT)
def derive_url(s: pd.Series) -> pd.DataFrame:
    return _derive_batch(s)


def with_url_info(df, url_col: str = "url", out: str = "u"):
    """Attach the derived-URL struct column ``out`` to ``df``."""
    return df.withColumn(out, derive_url(F.col(url_col)))
