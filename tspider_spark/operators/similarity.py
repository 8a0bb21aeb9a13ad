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
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
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


def sq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    rescore_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized (int8) ANN top-k with exact rescoring — the
    memory-bounded scale path next to :func:`ivf_topk`'s scan-bounded
    one: per-dimension min/max over the corpus define a uint8 grid,
    candidate generation runs on the quantized codes (4× smaller than
    float32 — the resident-index story at 10^9+ vectors; and the
    approximate score is an INTEGER dot product, so candidate sets are
    bit-reproducible across engines/partitionings — no float-sum-order
    ties), then the top ``k*rescore_factor`` candidates per query are
    rescored with the exact float cosine and cut to k.

    Scale shape: the min/max pass is one posexplode + dim-keyed agg
    (dim rows out, broadcast back); scoring is quantized-corpus scan ×
    broadcast quantized queries with a per-query top-(k·r) window;
    only candidates (k·r per query) touch the full-precision vectors
    again (hash join on the corpus id). Returns (query_id, rank,
    neighbor_id, cos_sim) like the other top-k operators; recall is
    exact whenever the true k-th neighbor survives the int8 cut
    (pinned vs brute force by test).
    """
    # cosine = dot of unit vectors: quantize the L2-NORMALIZED vectors,
    # so the int8 dot ranks by (approximate) cosine — quantizing raw
    # vectors would rank candidates by unnormalized dot product and
    # miss cosine neighbors whenever norms vary.
    def unit(df: DataFrame, out: str) -> DataFrame:
        nrm = norm_expr(vec_col)
        return df.select(
            F.col(id_col),
            F.col(vec_col),
            F.transform(
                vec_col, lambda x: x / F.greatest(nrm, F.lit(1e-300))
            ).alias(out),
        )

    corpus_u = unit(corpus, "nv")
    queries_u = unit(queries, "nv")
    # ONE symmetric scale (max |component| over the normalized corpus,
    # never 0 for non-degenerate input): q = round(x/a*127) keeps the
    # integer dot PROPORTIONAL to the true dot up to quantization noise
    # — a per-dim affine grid would inject offset cross-terms that are
    # not rank-preserving. 1-row aggregate, broadcast back.
    mm = (
        corpus_u.select(F.explode("nv").alias("x"))
        .agg(F.max(F.abs(F.col("x"))).alias("qscale"))
    )

    def quant(vec: str):
        # signed int8 code per dim; queries can fall outside the
        # corpus range, hence the clamp. Identical double arithmetic
        # on both engines -> identical codes.
        return F.expr(
            f"transform({vec}, x -> greatest(-127, least(127, "
            f"cast(floor(x / qscale * 127.0D + 0.5D) as int))))"
        )

    q = (
        queries_u.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "nv"
        )
        .crossJoin(F.broadcast(mm))
        .select("query_id", "qv", quant("nv").alias("qq"))
    )
    c = (
        corpus_u.select(F.col(id_col).alias("neighbor_id"), "nv")
        .crossJoin(F.broadcast(mm))
        .select("neighbor_id", quant("nv").alias("cq"))
    )
    approx = (
        F.broadcast(q.select("query_id", "qq"))
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with("qq", "cq", lambda a, b: (a * b).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("_s"),
        )
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.desc("_s"), F.asc("neighbor_id")
    )
    cands = (
        approx.withColumn("_rn", F.row_number().over(w_cand))
        .filter(F.col("_rn") <= k * rescore_factor)
        .select("query_id", "neighbor_id")
    )
    exact = (
        cands.join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(q.select("query_id", "qv")),
            "query_id",
        )
        .withColumn(
            "cos_sim", dot_expr("qv", "cv") / (norm_expr("qv") * norm_expr("cv"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


def _assign_to_centroids(
    df: DataFrame,
    cent: DataFrame,
    id_col: str,
    vec_col: str,
    assign: str,
) -> DataFrame:
    """(id, cluster_id, vec) with cluster_id = argmax-cosine centroid,
    ties to the smallest centroid id. ``assign="fold"``: broadcast
    cross join + JVM fold dots (all-JVM, right while n_clusters is
    window-sized); ``assign="numpy"``: one Arrow-batched matmul per
    batch against a driver-collected centroid matrix — the path for
    thousands of centroids, where k JVM fold dots per row lose to one
    BLAS matmul (same argmax/ties: numpy argmax picks the first =
    smallest index = smallest cid after the sort below)."""
    if assign == "numpy":
        rows = cent.select("cid", "cv").orderBy("cid").collect()
        cids = np.array([r["cid"] for r in rows], dtype=np.int64)
        mat = np.stack([np.asarray(r["cv"], dtype=np.float64) for r in rows])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)

        @pandas_udf(LongType())
        def nearest(vecs: pd.Series) -> pd.Series:
            m = np.stack(vecs.to_numpy())
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            return pd.Series(cids[(m @ mat.T).argmax(axis=1)])

        return df.select(
            id_col, F.col(vec_col), nearest(F.col(vec_col)).alias("cluster_id")
        ).select(id_col, "cluster_id", vec_col)
    scored = (
        df.select(id_col, vec_col)
        .crossJoin(F.broadcast(cent))
        .withColumn(
            "s", dot_expr(vec_col, "cv") / (norm_expr(vec_col) * norm_expr("cv"))
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("s"), F.asc("cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("cid").alias("cluster_id"), vec_col)
    )


def semdedup(
    df: DataFrame,
    tau: float = 0.95,
    n_clusters: int | None = 16,
    target_cluster_size: int = 4096,
    refine_iters: int = 0,
    centroid_mode: str = "first",
    assign: str = "fold",
    lsh_planes: int = 0,
    lsh_tables: int = 4,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic dedupe (SemDeDup, Abbas et al. 2023): cluster the
    embedding space, then within each cluster drop every item whose
    cosine to a LOWER-ID same-cluster item is >= ``tau`` (keep-first
    by id — the paper keeps an arbitrary representative per dup
    group; keep-first makes that choice deterministic).

    The cluster step only bounds the candidate set — dedup decisions
    always come from exact cosines — so centroid quality affects
    recall across cluster boundaries (a limitation SemDeDup itself
    shares), never precision.

    Scale controls (each independently oracle-preserving at fixed
    parameters):

    * ``n_clusters=None`` derives k = max(16, ceil(N /
      target_cluster_size)) from the corpus count, so the
      within-cluster pair step stays ~quadratic-in-target_cluster_size
      per cluster instead of quadratic in N/16 — the r2 scale gap.
    * ``centroid_mode``: "hash" picks the k rows with the smallest
      md5(id) — a deterministic uniform sample of the DATA (engine-
      portable: DuckDB's md5 agrees byte-for-byte) — instead of the
      degenerate "first" (k smallest ids, kept for parity tests).
    * ``refine_iters``: Lloyd refinement steps — assign to seeds,
      recompute each centroid as the element-wise mean of its members
      (posexplode + map-side-combinable avg; empty clusters vanish),
      reassign. One step already moves centroids from "k sampled
      points" to "k density-weighted centers".
    * ``assign="numpy"``: Arrow-batched matmul assignment for large k
      (see ``_assign_to_centroids``).
    * ``lsh_planes>0``: bound in-cluster pairs with ``lsh_tables``
      independent sign-LSH bucketings (reusing ``lsh_bucket_udf``) —
      candidate pairs must share (cluster, table, bucket), so a
      skewed mega-cluster degrades to LSH-bucket-sized joins instead
      of a cluster-sized self-join. Approximate in the same sense as
      ``cosine_dup_pairs_lsh``: a true pair at angle θ is missed by
      all tables with prob (1-(1-θ/π)^planes)^tables — at tau=0.95
      and 8 planes × 4 tables that is < 0.4%; exact duplicates are
      never missed (identical vectors share every bucket). Requires
      ``dim``.

    Output: (id_col, cluster_id, kept:int) for every input row.
    """
    if n_clusters is None:
        n = df.count()
        n_clusters = max(16, -(-n // target_cluster_size))
    if centroid_mode == "hash":
        seed_order = F.md5(F.col(id_col).cast("string").cast("binary"))
    else:
        seed_order = F.col(id_col).cast("string")
    cent = (
        df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy(seed_order.alias("_so"), "cid")
        .limit(n_clusters)
        .select("cid", "cv")
    )
    for _ in range(refine_iters):
        members = _assign_to_centroids(df, cent, id_col, vec_col, assign)
        cent = (
            members.select("cluster_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("_pm")
            )
            .select(
                F.col("cluster_id").alias("cid"),
                F.transform("_pm", lambda s: s["m"]).alias("cv"),
            )
        )
    assigned = _assign_to_centroids(df, cent, id_col, vec_col, assign)
    if lsh_planes:
        if dim is None:
            raise ValueError("lsh_planes needs dim")
        for t in range(lsh_tables):
            udf = lsh_bucket_udf(lsh_planes, dim, seed=3000 + t)
            assigned = assigned.withColumn(f"_sb{t}", udf(F.col(vec_col)))
    a = assigned.select(
        F.col(id_col).alias("ia"), "cluster_id", F.col(vec_col).alias("va"),
        *[F.col(f"_sb{t}").alias(f"_sa{t}") for t in range(lsh_tables if lsh_planes else 0)],
    )
    b = assigned.select(
        F.col(id_col).alias("ib"), "cluster_id", F.col(vec_col).alias("vb"),
        *[F.col(f"_sb{t}").alias(f"_sbb{t}") for t in range(lsh_tables if lsh_planes else 0)],
    )
    if lsh_planes:
        pairs = None
        for t in range(lsh_tables):
            p = (
                a.withColumnRenamed(f"_sa{t}", "_bk")
                .select("ia", "cluster_id", "va", "_bk")
                .join(
                    b.withColumnRenamed(f"_sbb{t}", "_bk").select(
                        "ib", "cluster_id", "vb", "_bk"
                    ),
                    ["cluster_id", "_bk"],
                )
                .drop("_bk")
                .filter(F.col("ia") < F.col("ib"))
            )
            pairs = p if pairs is None else pairs.unionByName(p)
        cand_pairs = pairs.dropDuplicates(["ia", "ib"])
    else:
        cand_pairs = a.join(b, "cluster_id").filter(F.col("ia") < F.col("ib"))
    dropped = (
        cand_pairs
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


def d4_prune(
    df: DataFrame,
    tau: float = 0.95,
    prune_frac: float = 0.25,
    n_clusters: int = 16,
    centroid_mode: str = "hash",
    assign: str = "fold",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """D4 data selection (Tirumala et al. 2023, "D4: Improving LLM
    Pretraining via Document De-Duplication and Diversification"):
    SemDeDup followed by SSL-prototype pruning — first drop semantic
    near-duplicates (cosine >= ``tau`` to a lower-id same-cluster
    item, exactly :func:`semdedup`'s rule), then within each cluster
    drop the ``ceil(prune_frac * n_survivors)`` MOST PROTOTYPICAL
    survivors: the ones with the highest cosine to their own cluster
    centroid (Sorscher et al. 2022 rank easy/redundant examples by
    closeness to the cluster prototype; D4 removes that head so the
    retained set is both dedup'd and diverse).

    Determinism: centroid seeding and assignment are exactly
    :func:`semdedup`'s (hash-sampled seeds, argmax-cosine ties to the
    smallest centroid id); the prototype rank breaks cosine ties by
    ascending id, so the kept set is engine-portable and
    oracle-checkable.

    Scale shape: one centroid seeding (global sort of md5(id) capped
    at ``n_clusters`` rows — a top-k, not a full sort), one broadcast
    assignment, the cluster-bounded dedup self-join (same candidate
    bound as semdedup — pair work is quadratic in cluster size, never
    in N), one broadcast join back to the centroid frame for the
    prototype cosine (cheap: one fold dot per surviving row), and ONE
    exchange on cluster_id for the per-cluster rank window. No
    driver collect, no Python beyond the optional ``assign="numpy"``
    matmul.

    Output: (id, cluster_id, sem_kept:int, kept:int) for every input
    row — ``sem_kept=0`` rows are semantic dups (kept=0 too);
    ``sem_kept=1, kept=0`` rows are the pruned prototypes.
    """
    if centroid_mode == "hash":
        seed_order = F.md5(F.col(id_col).cast("string").cast("binary"))
    else:
        seed_order = F.col(id_col).cast("string")
    cent = (
        df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy(seed_order.alias("_so"), "cid")
        .limit(n_clusters)
        .select("cid", "cv")
    )
    assigned = _assign_to_centroids(df, cent, id_col, vec_col, assign)
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
        .withColumn("_semdrop", F.lit(1))
    )
    flagged = assigned.join(dropped, id_col, "left").select(
        id_col,
        "cluster_id",
        F.col(vec_col),
        F.when(F.col("_semdrop").isNull(), 1).otherwise(0).alias("sem_kept"),
    )
    # prototype cosine: survivor x its OWN centroid (broadcast join on
    # cluster_id — k rows), ranked most-prototypical-first per cluster
    proto = (
        flagged.filter(F.col("sem_kept") == 1)
        .join(
            F.broadcast(cent.select(F.col("cid").alias("cluster_id"), "cv")),
            "cluster_id",
        )
        .withColumn(
            "_pc",
            dot_expr(vec_col, "cv") / (norm_expr(vec_col) * norm_expr("cv")),
        )
    )
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.desc("_pc"), F.asc(id_col)
    )
    w_all = Window.partitionBy("cluster_id")
    pruned = (
        proto.withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "_cut", F.ceil(F.col("_n") * F.lit(float(prune_frac))).cast("long")
        )
        .select(
            id_col,
            (F.col("_rn") > F.col("_cut")).cast("int").alias("_proto_kept"),
        )
    )
    return (
        flagged.join(pruned, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            "sem_kept",
            F.when(F.col("sem_kept") == 0, 0)
            .otherwise(F.col("_proto_kept"))
            .cast("int")
            .alias("kept"),
        )
    )


def _unit(df: DataFrame, id_col: str, vec_col: str, out: str) -> DataFrame:
    nrm = norm_expr(vec_col)
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        F.transform(
            vec_col, lambda x: x / F.greatest(nrm, F.lit(1e-300))
        ).alias(out),
    )


def _l2_expr(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_subvectors(
    unit: DataFrame, id_col: str, m: int, dsub: int, nv: str = "nv"
) -> DataFrame:
    return unit.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        F.col(nv),
    ).select(
        id_col, "s", F.slice(nv, F.col("s") * dsub + 1, dsub).alias("sv")
    )


def _pq_assign(subs: DataFrame, cent: DataFrame, id_col: str) -> DataFrame:
    """(id, s, code): nearest centroid per subspace by L2, ties to the
    smallest code. Broadcast join (m*ksub centroid rows) + one window."""
    scored = subs.join(F.broadcast(cent), "s").withColumn(
        "_d", _l2_expr("sv", "cv")
    )
    w = Window.partitionBy(id_col, "s").orderBy(F.asc("_d"), F.asc("cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "s", F.col("cid").alias("code"))
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebooks (Jegou et al. 2011): the vector
    is split into ``m`` contiguous ``dim/m``-dim subspaces, each with
    its own ``ksub``-centroid codebook, so a vector compresses to m
    small codes (m=4, ksub=16 -> 2 bytes/vector vs 256 for float32 —
    the resident-index story at 10^10 vectors, 128x smaller than SQ's
    4x).

    Deterministic and engine-portable like semdedup's centroids: seeds
    are the ksub corpus rows with the smallest md5(id) (a uniform
    hash-sample of the data), sliced per subspace; ``lloyd_iters``
    k-means steps refine each subspace codebook independently (assign
    by L2 w/ smallest-code ties, recompute element-wise means;
    emptied codes vanish). All JVM: the per-subspace assign is a
    broadcast join against m*ksub centroid rows + one (id, s) window.

    Returns (s, cid, cv) over the L2-NORMALIZED corpus (for unit
    vectors L2 ranks cosine: cos = 1 - d2/2), ordered for broadcast.
    """
    dsub = dim // m
    if dsub * m != dim:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    unit = _unit(corpus, id_col, vec_col, "nv")
    # seed pick is a distributed TakeOrdered (like semdedup), never a
    # window; the seed row's own id is the code label (codes need a
    # deterministic total order for tie-breaks, not 0-based numbering)
    seed_order = F.md5(F.col(id_col).cast("string").cast("binary"))
    seeds = (
        unit.select(id_col, "nv", seed_order.alias("_so"))
        .orderBy("_so", id_col)
        .limit(ksub)
        .select(F.col(id_col).alias("cid"), "nv")
    )
    cent = seeds.select(
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"), "cid", "nv"
    ).select("s", "cid", F.slice("nv", F.col("s") * dsub + 1, dsub).alias("cv"))

    subs = _pq_subvectors(unit, id_col, m, dsub)
    for _ in range(lloyd_iters):
        asg = _pq_assign(subs, cent, id_col)
        cent = (
            asg.join(subs, [id_col, "s"])
            .select("s", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("s", "code", "pos")
            .agg(F.avg("x").alias("mx"))
            .groupBy("s", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mx"))).alias("_pm"))
            .select(
                "s",
                F.col("code").alias("cid"),
                F.transform("_pm", lambda p: p["mx"]).alias("cv"),
            )
        )
    return cent


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
    rescore_factor: int = 4,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN top-k with asymmetric-distance (ADC) candidate
    generation + exact cosine rescore — the third scale path next to
    :func:`ivf_topk` (scan-bounded) and :func:`sq_topk`
    (memory-bounded): the corpus is scanned as 2-byte code tuples and
    only ``k*rescore_factor`` candidates per query touch the
    full-precision vectors again.

    ADC: per query, exact L2 distances to every (subspace, centroid)
    pair form a lookup table (Q*m*ksub rows — broadcast); a corpus
    vector's approximate distance is the SUM of its m looked-up
    entries. Scores are rounded to 9 decimals before ranking so
    code-tuple ties (the common case under PQ compression) resolve by
    the neighbor-id tie-break identically on any engine or partition
    order, never by float-sum last bits. Candidate ranking asc by
    (adc, neighbor_id); output (query_id, rank, neighbor_id, cos_sim)
    like the other top-k operators.
    """
    dsub = dim // m
    cent = pq_codebooks(
        corpus, m=m, ksub=ksub, dim=dim, lloyd_iters=lloyd_iters,
        id_col=id_col, vec_col=vec_col,
    )
    unit_c = _unit(corpus, id_col, vec_col, "nv")
    codes = _pq_assign(
        _pq_subvectors(unit_c, id_col, m, dsub), cent, id_col
    ).select(F.col(id_col).alias("neighbor_id"), "s", "code")

    unit_q = _unit(queries, id_col, vec_col, "nv")
    qd = (
        _pq_subvectors(unit_q, id_col, m, dsub)
        .withColumnRenamed(id_col, "query_id")
        .join(F.broadcast(cent), "s")
        .select("query_id", "s", F.col("cid").alias("code"),
                _l2_expr("sv", "cv").alias("_d"))
    )
    approx = (
        codes.join(F.broadcast(qd), ["s", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("_d"), 9).alias("_adc"))
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.asc("_adc"), F.asc("neighbor_id")
    )
    cands = (
        approx.withColumn("_rn", F.row_number().over(w_cand))
        .filter(F.col("_rn") <= k * rescore_factor)
        .select("query_id", "neighbor_id")
    )
    exact = (
        cands.join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
                )
            ),
            "query_id",
        )
        .withColumn(
            "cos_sim", dot_expr("qv", "cv") / (norm_expr("qv") * norm_expr("cv"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
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
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


def matryoshka_overlap(
    vectors: DataFrame,
    n_queries: int = 16,
    dims: tuple = (64, 32, 16),
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka truncation evaluation (Kusupati et al. 2022, MRL):
    how much of the full-dimension cosine top-k survives when the
    embedding column is truncated to its leading ``d`` dims — the
    harness that picks the serving dimension for an ANN index BEFORE
    committing a 100-TB corpus to it (half the dims = half the index
    bytes and twice the QPS, if the overlap holds).

    For each d in ``dims``: brute-force cosine top-k over vectors
    truncated with ``slice(vec, 1, d)``, then per-query overlap with
    the FULL-dim top-k (dims[0] must be the full width, overlap 1.0
    by construction — the built-in sanity row). Per-dim output:
    (dim, mean_overlap, min_overlap), overlaps on the exact m/k grid.

    Scale shape: each dim is one broadcast-query cross join + per-
    query top-k (the labeled brute baseline; swap in the IVF/PQ path
    for the index side at scale) and the overlap join is keyed on
    (query, neighbor) — metadata-sized (n_queries x k rows per dim).
    """
    full_dim = dims[0]
    base = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    tops = {}
    for d in dims:
        cd = base.select(
            F.col(id_col), F.slice("_v", 1, d).alias(vec_col)
        )
        qd = cd.filter(F.col(id_col) < n_queries)
        tops[d] = brute_force_topk(qd, cd, k, id_col=id_col).select(
            "query_id", "neighbor_id"
        )
    # distinct column names break the tops[full]-vs-fullt self-join
    # ambiguity (both derive from the same plan)
    fullt = tops[full_dim].select(
        F.col("query_id").alias("_fq"), F.col("neighbor_id").alias("_fn")
    ).localCheckpoint(eager=True)
    qids = fullt.select(F.col("_fq").alias("_q")).distinct()
    out = None
    for d in dims:
        matched = (
            tops[d]
            .join(
                fullt,
                (F.col("query_id") == F.col("_fq"))
                & (F.col("neighbor_id") == F.col("_fn")),
            )
            .groupBy(F.col("query_id").alias("_q"))
            .agg(F.count(F.lit(1)).alias("_m"))
        )
        per_q = qids.join(matched, "_q", "left").select(
            (F.coalesce(F.col("_m"), F.lit(0)) / F.lit(float(k))).alias("_ov")
        )
        row = per_q.agg(
            F.lit(d).cast("int").alias("dim"),
            F.round(F.avg("_ov"), 6).alias("mean_overlap"),
            F.round(F.min("_ov"), 6).alias("min_overlap"),
        )
        out = row if out is None else out.unionByName(row)
    return out
