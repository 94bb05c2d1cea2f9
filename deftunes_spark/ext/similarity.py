"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — one scan, JVM-side arithmetic via
higher-order array functions (zip_with/aggregate), TakeOrdered for the
top-k (no global sort).

Scale path: random-hyperplane LSH — each vector maps to an n-bit
bucket; a query probes its own bucket (+ optional multi-probe
neighbors) and reranks exactly. Bucketing is a narrow map; the only
shuffle is the final per-bucket candidate scan. For 100 TB, write the
bucketed table partitioned by bucket prefix so probes become partition-
pruned scans.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)).cast("double") for x in vec])


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ in double, via zip_with + aggregate (codegen, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_to_query(
    df: DataFrame, query_vec: list[float], vec_col: str = "embedding"
) -> DataFrame:
    q = _vec_lit(query_vec)
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype="float64")))
    sim = dot_expr(F.col(vec_col), q) / (
        norm_expr(F.col(vec_col)) * F.lit(qn)
    )
    return df.withColumn("cosine_sim", sim)


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k by cosine similarity.

    orderBy+limit compiles to TakeOrderedAndProject: each partition
    keeps its local top-k, the driver merges — no global sort shuffle.
    Ties broken by id for determinism.
    """
    return (
        cosine_to_query(df, query_vec, vec_col)
        .select(id_col, "cosine_sim")
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------
# Random-hyperplane LSH (signed random projections)
# ---------------------------------------------------------------------


def random_hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes, shape (n_bits, dim)."""
    return np.random.RandomState(seed).randn(n_bits, dim)


def lsh_bucket_expr(
    vec_col: str, planes: np.ndarray
) -> Column:
    """Bucket id = sign-bit integer over the hyperplane projections."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot_expr(F.col(vec_col), _vec_lit([float(x) for x in plane]))
        bit = F.when(d >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def with_lsh_bucket(
    df: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    return df.withColumn(bucket_col, lsh_bucket_expr(vec_col, planes))


def _query_buckets(
    query_vec: list[float], planes: np.ndarray, n_probes: int
) -> list[int]:
    """Own bucket + multi-probe neighbors (flip the least-confident
    bits first — standard multi-probe LSH)."""
    proj = planes @ np.asarray(query_vec, dtype="float64")
    base = 0
    for i, p in enumerate(proj):
        if p >= 0:
            base |= 1 << i
    order = np.argsort(np.abs(proj))
    buckets = [base]
    for bit in order[: max(0, n_probes - 1)]:
        buckets.append(base ^ (1 << int(bit)))
    return buckets


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    planes: np.ndarray | None = None,
    n_bits: int = 8,
    n_probes: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: probe LSH buckets, rerank exact cosine.

    If ``bucket_col`` is given, the DataFrame is already bucketed
    (precomputed/partitioned table — the 100 TB path where the bucket
    filter becomes partition pruning); otherwise buckets are computed
    on the fly.
    """
    if planes is None:
        planes = random_hyperplanes(len(query_vec), n_bits, seed)
    if bucket_col is None:
        bucket_col = "lsh_bucket"
        df = with_lsh_bucket(df, planes, vec_col, bucket_col)
    buckets = _query_buckets(query_vec, planes, n_probes)
    candidates = df.filter(F.col(bucket_col).isin(buckets))
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------
# IVF (inverted-file) ANN — k-means coarse quantizer
# ---------------------------------------------------------------------


def ivf_index(
    df: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> tuple[DataFrame, list[list[float]]]:
    """Build an IVF index: k-means (MLlib, JVM-side) coarse quantizer,
    every vector assigned to its nearest centroid's inverted list.

    Returns (assigned_df with ``ivf_list`` column, centroids). At
    100 TB: persist ``assigned_df`` partitioned by ``ivf_list`` so a
    probe reads only n_probe/n_lists of the table (partition pruning);
    centroids are a driver-side kilobyte array."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = df.withColumn(
        "_ivf_feat", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(
        k=n_lists,
        seed=seed,
        maxIter=max_iter,
        featuresCol="_ivf_feat",
        predictionCol="ivf_list",
    ).fit(with_vec)
    assigned = model.transform(with_vec).drop("_ivf_feat")
    centroids = [np.asarray(c).tolist() for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: nearest ``n_probe`` centroids by L2 (the quantizer's
    metric, driver-side numpy over the kilobyte centroid table), then
    exact cosine rerank inside those lists only."""
    q = np.asarray(query_vec, dtype="float64")
    dists = [float(np.linalg.norm(q - np.asarray(c))) for c in centroids]
    probe = sorted(range(len(dists)), key=lambda i: dists[i])[:n_probe]
    cands = assigned.filter(F.col("ivf_list").isin(probe))
    return cosine_topk(cands, query_vec, k, id_col, vec_col)


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    planes: np.ndarray | None = None,
    n_bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket equi-join + exact cosine.

    Only vectors sharing an LSH bucket are compared (high-cosine pairs
    collide with high probability; raise n_bits to cut candidates,
    lower it to raise recall). Never a cross join.
    """
    if planes is None:
        probe = df.select(vec_col).first()
        if probe is None:  # empty corpus → zero pairs, not a crash
            return df.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine_sim double"
            )
        planes = random_hyperplanes(len(probe[0]), n_bits, seed)
    bucketed = with_lsh_bucket(df, planes, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("lsh_bucket")
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    sim = dot_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
        norm_expr(F.col(f"a.{vec_col}")) * norm_expr(F.col(f"b.{vec_col}"))
    )
    return (
        a.join(
            b,
            (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
