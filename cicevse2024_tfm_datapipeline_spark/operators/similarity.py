"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k: exact baseline. The query set is broadcast
  (it's small by construction); candidates stream through one scan —
  no shuffle of the big side, top-k via per-partition heaps
  (TakeOrdered / window row_number per query).
- sign-bucket (LSH/IVF-style) top-k: candidates restricted to the same
  coarse bucket (sign pattern of leading dimensions ≡ axis-aligned
  random-hyperplane LSH). The join becomes an equi-join on bucket id —
  the 100 TB path: per-bucket locality, no n² pairs.

Dot products use F.zip_with + F.aggregate (strictly sequential fold —
deterministic, engine-portable) after casting float → double once.
For very wide vectors a Pandas-UDF BLAS path would win; at 64-dim the
codegen'd fold is competitive and keeps everything JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cicevse2024_tfm_datapipeline_spark.operators.skew import ensure_min_parallelism


def as_double_array(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("array<double>")


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def sign_bucket_expr(a: Column, n_dims: int = 8) -> Column:
    """Coarse quantizer: bucket = Σ (a[i] ≥ 0) << i over leading dims —
    axis-aligned random-hyperplane LSH (embeddings are already random
    projections; for raw features use a seeded rotation first)."""
    bucket = F.lit(0)
    for i in range(n_dims):
        bucket = bucket + F.when(F.element_at(a, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact cosine top-k per query (self excluded). ``queries`` must be
    small — it is broadcast; the candidate side never shuffles."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    )
    c = ensure_min_parallelism(embeddings).select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    win = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rk", F.row_number().over(win))
        .filter(F.col("__rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("__rk").alias("rank"))
    )


def bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_bucket_dims: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates share the query's sign bucket. The
    bucket equi-join replaces the cross product — the scale path."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("qv"),
    ).withColumn("bucket", sign_bucket_expr(F.col("qv"), n_bucket_dims))
    c = ensure_min_parallelism(embeddings).select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("cv"),
    ).withColumn("bucket", sign_bucket_expr(F.col("cv"), n_bucket_dims))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    win = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rk", F.row_number().over(win))
        .filter(F.col("__rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("__rk").alias("rank"))
    )


def near_dup_pairs_cosine(
    embeddings: DataFrame, id_col: str, vec_col: str, threshold: float, n_bucket_dims: int = 8
) -> DataFrame:
    """Embedding-cosine near-dup detection, bucketed: only same-bucket
    pairs are scored (sign-LSH recall tradeoff, standard at scale)."""
    e = ensure_min_parallelism(embeddings).select(
        F.col(id_col).alias("id"), as_double_array(vec_col).alias("v")
    ).withColumn("bucket", sign_bucket_expr(F.col("v"), n_bucket_dims))
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_expr(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_clusters: int = 16,
    nprobe: int = 2,
    seed: int = 7,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    partitions the corpus into ``n_clusters`` cells; each query probes its
    ``nprobe`` nearest centroids and scores only those cells.

    The 100-TB shape: one ML fit (sampled/streamed by Spark ML), one
    assignment pass over the corpus (model.transform — no shuffle), then
    candidate scoring is an equi-join on cell id — exactly the LSH-bucket
    plan but with LEARNED cells, so recall tracks the data distribution
    instead of axis signs. Centroids (n_clusters × dim floats) broadcast
    anywhere. Deterministic given the seed and input.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    raw = embeddings.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("cv")
    )
    # fit on the scan's natural partitioning (iterative ML jobs pay per-task
    # scheduling every iteration — fanning out a tiny input hurts); only the
    # single assignment+scoring pass benefits from the parallelism floor.
    # At corpus scale, fit the quantizer on a deterministic sample (id-hash
    # filter) — not done here because the synthetic corpora are small
    # enough that sampling visibly costs recall.
    fit_vec = raw.withColumn("__features", array_to_vector("cv"))
    # random init + bounded iterations: a coarse quantizer needs balanced
    # cells, not converged centroids — k-means|| init alone costs more
    # passes than the whole fit this way
    model = KMeans(
        k=n_clusters,
        seed=seed,
        featuresCol="__features",
        initMode="random",
        maxIter=8,
    ).fit(fit_vec)
    cand = ensure_min_parallelism(raw).withColumn("__features", array_to_vector("cv"))
    assigned = model.transform(cand).select(
        "neighbor_id", "cv", F.col("prediction").alias("cell")
    )

    # centroids as a tiny broadcast table (cell, centroid array<double>)
    centroids = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = embeddings.sparkSession.createDataFrame(
        centroids, schema="cell int, centroid array<double>"
    )

    # each query probes its nprobe nearest centroids (L2)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    probe_win = W.partitionBy("query_id").orderBy(F.asc("__l2"), F.asc("cell"))
    probes = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("__l2", l2)
        .withColumn("__pr", F.row_number().over(probe_win))
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "qv", "cell")
    )

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    win = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rk", F.row_number().over(win))
        .filter(F.col("__rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("__rk").alias("rank"))
    )
