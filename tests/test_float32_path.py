"""r6 verdict #7: float32 end-to-end embedding path. Vectors stored
as ``array<float>`` halve every ANN scan at 100 TB (26 B x 768 dims);
the operators must accept them natively — `_dot_sql`/`dot_expr` CAST
per element, the numpy kernels upcast on entry — and agree with the
float64 path within the decision guard bands."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_pair(spark, tmp_path_factory):
    """(float64_df, float32_df) both read back from parquet so the
    float32 side exercises real storage + Arrow transfer, not just a
    cast in the plan."""
    tmp = tmp_path_factory.mktemp("f32")
    f64 = spark.read.parquet(f"{SF}/embeddings.parquet")
    p32 = str(tmp / "emb_f32.parquet")
    f64.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    ).write.mode("overwrite").parquet(p32)
    p64 = str(tmp / "emb_f64.parquet")
    f64.write.mode("overwrite").parquet(p64)
    return (
        spark.read.parquet(p64),
        spark.read.parquet(p32),
        p64,
        p32,
    )


def _centroids(df, n=4):
    rows = df.orderBy("vec_id").limit(n).collect()
    return [[float(x) for x in r.embedding] for r in rows]


def test_parquet_bytes_roughly_halved(spark, tmp_path):
    """Scan-bytes measurement on a table big enough that vector pages
    dominate file overhead (the sf0.001 fixture is 50 rows — footer
    noise): 20k x 64-dim random vectors, snappy parquet."""
    rng = np.random.RandomState(9)
    pdf_rows = [
        (i, [float(x) for x in rng.randn(64)]) for i in range(20_000)
    ]
    df = spark.createDataFrame(
        pdf_rows, "vec_id long, embedding array<double>"
    ).coalesce(1)
    p64 = str(tmp_path / "e64.parquet")
    p32 = str(tmp_path / "e32.parquet")
    df.write.mode("overwrite").parquet(p64)
    df.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    ).write.mode("overwrite").parquet(p32)

    def _sz(p):
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )

    s64, s32 = _sz(p64), _sz(p32)
    # Random mantissas are incompressible: the float column must come
    # in at roughly half. Allow headroom for headers/id column.
    assert s32 < 0.60 * s64, (s32, s64)


def test_ivf_assign_accepts_float32_same_clusters(spark, emb_pair):
    from deftunes_spark.ext.similarity import ivf_assign

    f64, f32, _, _ = emb_pair
    cents = _centroids(f64)
    a64 = {
        r.vec_id: r.ivf_list
        for r in ivf_assign(f64, cents, "embedding").collect()
    }
    a32 = {
        r.vec_id: r.ivf_list
        for r in ivf_assign(f32, cents, "embedding").collect()
    }
    assert a32 == a64


def test_knn_grouped_float32_neighbor_parity(spark, emb_pair):
    from deftunes_spark.ext.similarity import knn_join_grouped

    f64, f32, _, _ = emb_pair
    cents = _centroids(f64)
    n64 = {
        (r.vec_id, r.neighbor_id)
        for r in knn_join_grouped(f64, cents, k=3).collect()
    }
    n32 = {
        (r.vec_id, r.neighbor_id)
        for r in knn_join_grouped(f32, cents, k=3).collect()
    }
    # float32 storage perturbs sims ~1e-7 — far inside the 6-dp
    # rounding granularity for non-tie pairs; neighbor sets may only
    # differ if a true tie sat exactly on a 6th-decimal boundary.
    # On this fixture they must be identical.
    assert n32 == n64


def test_knn_grouped_float32_sims_close(spark, emb_pair):
    from deftunes_spark.ext.similarity import knn_join_grouped

    f64, f32, _, _ = emb_pair
    cents = _centroids(f64)
    s64 = {
        (r.vec_id, r.neighbor_id): r.cosine_sim
        for r in knn_join_grouped(f64, cents, k=3).collect()
    }
    s32 = {
        (r.vec_id, r.neighbor_id): r.cosine_sim
        for r in knn_join_grouped(f32, cents, k=3).collect()
    }
    for key in s64:
        assert abs(s64[key] - s32[key]) <= 2e-6


def test_semantic_dedup_float32_keep_parity(spark, emb_pair):
    from deftunes_spark.ext.curation import semantic_dedup

    f64, f32, _, _ = emb_pair
    cents = _centroids(f64)
    k64 = {
        r.vec_id: r.kept
        for r in semantic_dedup(f64, cents, threshold=0.8).collect()
    }
    k32 = {
        r.vec_id: r.kept
        for r in semantic_dedup(f32, cents, threshold=0.8).collect()
    }
    assert k32 == k64


def test_exact_duplicates_still_collapse_in_float32(spark):
    """Duplicate-mass parity in float32: identical vectors stay
    bit-identical through the float cast, so cosine 1.0 survives and
    dedup decisions match float64 exactly."""
    from deftunes_spark.ext.curation import semantic_dedup

    rng = np.random.RandomState(3)
    proto = rng.randn(8)
    rows = [(i, [float(x) for x in proto]) for i in range(10)] + [
        (10 + i, [float(x) for x in rng.randn(8)]) for i in range(10)
    ]
    f32 = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    kept = {
        r.vec_id: r.kept
        for r in semantic_dedup(
            f32, [[0.0] * 8], threshold=0.95, max_cluster_rows=6
        ).collect()
    }
    assert kept[0] is True
    assert all(kept[i] is False for i in range(1, 10))
