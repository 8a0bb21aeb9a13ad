"""Similarity search over an embedding column (array<float>):
brute-force cosine top-k as the exact baseline, plus two scale paths —
random-hyperplane LSH bucketing for near-dup pairs and an IVF
(inverted-file) index for top-k probes.

The dot products stay JVM-side (``zip_with`` + ``aggregate`` — no
Python in the hot path); the only pandas UDF is the LSH/IVF bucket
assignment, which is a numpy matmul per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import IntegerType, LongType


def dot_expr(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: str):
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query. Returns (query_id, rank, neighbor_id,
    cos_sim). Ties broken by neighbor id for determinism."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            dot_expr("qv", "cv") / (norm_expr("qv") * norm_expr("cv")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"))
    )


def _hyperplanes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def lsh_bucket_udf(n_planes: int, dim: int, seed: int = 7):
    planes = _hyperplanes(n_planes, dim, seed)

    @pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        signs = (m @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(signs @ weights)

    return bucket


def cosine_dup_pairs_lsh(
    df: DataFrame,
    tau: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs (cos >= tau): n_tables independent
    sign-LSH bucketings; pairs colliding in any table are verified
    with the exact JVM cosine. High tau ⇒ tiny angle ⇒ per-table miss
    prob (1-(1-θ/π)^n_planes) is small and independent across tables."""
    with_buckets = df
    for t in range(n_tables):
        udf = lsh_bucket_udf(n_planes, dim, seed=1000 + t)
        with_buckets = with_buckets.withColumn(f"b{t}", udf(F.col(vec_col)))
    pairs = None
    for t in range(n_tables):
        a = with_buckets.select(
            F.col(id_col).alias("ia"), F.col(vec_col).alias("va"), F.col(f"b{t}").alias("bk")
        )
        b = with_buckets.select(
            F.col(id_col).alias("ib"), F.col(vec_col).alias("vb"), F.col(f"b{t}").alias("bk")
        )
        p = a.join(b, "bk").filter(F.col("ia") < F.col("ib")).select("ia", "ib", "va", "vb")
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.dropDuplicates(["ia", "ib"])
    return (
        pairs.withColumn(
            "cos_sim", dot_expr("va", "vb") / (norm_expr("va") * norm_expr("vb"))
        )
        .filter(F.col("cos_sim") >= tau)
        .select("ia", "ib", F.round("cos_sim", 6).alias("cos_sim"))
    )


def semdedup(
    df: DataFrame,
    tau: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic dedupe (SemDeDup, Abbas et al. 2023): cluster the
    embedding space, then within each cluster drop every item whose
    cosine to a LOWER-ID same-cluster item is >= ``tau`` (keep-first
    by id — the paper keeps an arbitrary representative per dup
    group; keep-first makes that choice deterministic).

    Clustering here is a deterministic partitioner, not learned
    k-means: centroids are the ``n_clusters`` smallest-id vectors and
    assignment is argmax cosine (ties to the smallest centroid id).
    As with ``ivf_topk``, the cluster step only bounds the candidate
    set — dedup decisions always come from exact cosines — so
    centroid quality affects recall across cluster boundaries (a
    limitation SemDeDup itself shares), never precision.

    Scale: assignment is a broadcast cross join against n_clusters
    rows with JVM fold dot products (swap in ``ivf_assign_udf``'s
    numpy matmul when n_clusters is large); the pairwise step
    shuffles once on cluster_id and is quadratic only within a
    cluster — exactly the complexity bound the paper's per-cluster
    design exists to provide.

    Output: (id_col, cluster_id, kept:int) for every input row.
    """
    cent = F.broadcast(
        df.orderBy(id_col)
        .limit(n_clusters)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    )
    scored = (
        df.select(id_col, vec_col)
        .crossJoin(cent)
        .withColumn("s", dot_expr(vec_col, "cv") / (norm_expr(vec_col) * norm_expr("cv")))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("s"), F.asc("cid"))
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("cid").alias("cluster_id"), vec_col)
    )
    a = assigned.select(
        F.col(id_col).alias("ia"), "cluster_id", F.col(vec_col).alias("va")
    )
    b = assigned.select(
        F.col(id_col).alias("ib"), "cluster_id", F.col(vec_col).alias("vb")
    )
    dropped = (
        a.join(b, "cluster_id")
        .filter(F.col("ia") < F.col("ib"))
        .filter(dot_expr("va", "vb") / (norm_expr("va") * norm_expr("vb")) >= tau)
        .select(F.col("ib").alias(id_col))
        .distinct()
        .withColumn("_drop", F.lit(1))
    )
    return (
        assigned.join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.when(F.col("_drop").isNull(), 1).otherwise(0).alias("kept"),
        )
    )


def ivf_assign_udf(centroids: np.ndarray):
    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        return pd.Series((m @ c.T).argmax(axis=1).astype(np.int32))

    return assign


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> DataFrame:
    """IVF approximate top-k: deterministic pseudo-random centroids
    (good enough as a partitioner — IVF recall comes from n_probe, not
    centroid quality), corpus bucketed once by nearest centroid,
    queries probe their n_probe nearest lists only. The scan is
    restricted to ~n_probe/n_lists of the corpus — that fraction IS
    the speedup at scale; exactness is recovered by raising n_probe."""
    centroids = _hyperplanes(n_lists, dim, seed)
    assign = ivf_assign_udf(centroids)
    c = corpus.withColumn("list_id", assign(F.col(vec_col)))

    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf("array<int>")
    def probe_lists(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        top = np.argsort(-(m @ cn.T), axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(probe_lists(F.col(vec_col))).alias("list_id"),
    )
    scored = (
        q.join(c.select("list_id", F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")), "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", dot_expr("qv", "cv") / (norm_expr("qv") * norm_expr("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"))
    )
