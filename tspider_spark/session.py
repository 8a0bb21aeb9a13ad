"""SparkSession factory with the engine's scale-oriented defaults.

Arrow is mandatory (all Python UDFs in the engine are pandas/Arrow
UDFs, per the input contract: no per-row Python). AQE is on so skewed
shuffles (hot hosts in the budget window, seen-set anti-joins) get
runtime re-planning on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tspider-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("TSPIDER_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # the wave pipeline caches every stage boundary; without this
        # AQE is silently disabled below each InMemoryRelation and tiny
        # shuffles keep the full static partition count
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("TSPIDER_DRIVER_MEM", "8g"))
        # throughput-batch workload: ParallelGC measured ~25% faster
        # end-to-end than G1 on the wave pipeline (local, 32 threads)
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("TSPIDER_JVM_OPTS", "-XX:+UseParallelGC"),
        )
        .config("spark.ui.enabled", "false")
    )
    extra = os.environ.get("TSPIDER_EXTRA_CONF")
    if extra:
        import json

        for k, v in json.loads(extra).items():
            builder = builder.config(k, str(v))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, str(v))
    return builder.getOrCreate()


def warm_python_workers(spark: SparkSession, parallelism: int | None = None):
    """Fork-and-import the Arrow python workers once, before timed work.

    The first pandas-UDF stage otherwise pays one cold start per core
    (fork + pandas/pyarrow import, seconds each, all contending) in the
    middle of the pipeline; on a long-lived cluster the workers are warm
    after the first minutes, so the bench should measure the warm state.
    Workers are reused afterwards (spark.python.worker.reuse default).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import LongType

    n = parallelism or spark.sparkContext.defaultParallelism

    def _noop(s):
        # pull in the engine's worker-side dependency stack so the
        # first real batch doesn't pay the imports (once per worker)
        import tspider_spark.functions.urlpure  # noqa: F401

        return s

    # real type objects (PEP 563 string hints don't resolve here)
    _noop.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _noop = pandas_udf(LongType())(_noop)

    spark.range(n * 4, numPartitions=n).select(
        F.sum(_noop(F.col("id")))
    ).collect()
