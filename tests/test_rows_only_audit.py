"""r6 verdict #6: the rows-only registry queries must be
self-evidencing — each output now carries invariant audit columns the
driver pins via row identity. This suite asserts ZERO violations at
sf0.01, and at a 10x-replicated fixture for the kernels where skew
blowup lives (semantic_dedup_auto / the grouped knn kernel).
``ann_knn_join_fast`` left this list in r10: it is registered under
the expr path's FULL value-hash oracle now (strictly stronger than
its old audit_ok column), but its kernel is still stressed at 10x
below."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

ROWS_ONLY_AUDITED = [
    "dedup_minhash_fast",
    "dedup_incremental_fast",
    "bpe_merges",
    "unigram_vocab",
    "source_overlap_minhash",
]


@pytest.mark.parametrize("name", ROWS_ONLY_AUDITED)
def test_audit_ok_zero_violations(spark, name):
    from deftunes_spark.registry import QUERIES

    df = QUERIES[name](spark, SF)
    assert "audit_ok" in df.columns
    total, bad = df.agg(
        F.count(F.lit(1)),
        F.sum(F.when(~F.col("audit_ok"), 1).otherwise(0)),
    ).first()
    assert total > 0
    assert bad == 0, f"{name}: {bad}/{total} audit violations"


def test_semantic_dedup_auto_audit(spark):
    from deftunes_spark.registry import QUERIES

    df = QUERIES["semantic_dedup_auto"](spark, SF)
    rows = df.agg(
        F.count(F.lit(1)),
        F.sum(F.when(~F.col("audit_ok"), 1).otherwise(0)),
        F.min("cluster_kept"),
        F.min("cluster_rows"),
    ).first()
    total, bad, min_kept, min_rows = rows
    assert total > 0 and bad == 0
    assert min_kept >= 1 and min_rows >= 1


def test_sequence_pack_bestfit_audit(spark):
    from deftunes_spark.registry import QUERIES

    df = QUERIES["sequence_pack_bestfit"](spark, SF)
    total, viol = df.agg(
        F.count(F.lit(1)), F.sum("capacity_violation")
    ).first()
    assert total > 0
    assert viol == 0


def test_knn_and_semdedup_audit_at_10x(spark):
    """10x-replicated embeddings (shifted ids — a 90%-duplicate-mass
    corpus): the audit columns must stay violation-free through the
    hot-cluster split path."""
    from deftunes_spark.ext.curation import semantic_dedup
    from deftunes_spark.ext.similarity import knn_join_grouped

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = base.count()
    rep = None
    for i in range(10):
        part = base.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            "embedding",
        )
        rep = part if rep is None else rep.unionByName(part)
    cents = [[0.0] * len(base.first().embedding)]  # ONE hot cluster
    cap = 200  # force a multi-way split at 10x
    knn = knn_join_grouped(rep, cents, k=3, max_cluster_rows=cap)
    bad_knn = knn.filter(
        ~(
            F.col("rank").between(1, 3)
            & (F.col("vec_id") != F.col("neighbor_id"))
            & F.col("cosine_sim").between(-1.000001, 1.000001)
        )
    ).count()
    assert bad_knn == 0
    sd = semantic_dedup(
        rep, cents, threshold=0.95, max_cluster_rows=cap
    )
    # Replicated vectors are exact duplicates: of each identical set
    # only the min id may survive; every cluster keeps >= 1.
    stats = sd.groupBy("cluster").agg(
        F.sum(F.col("kept").cast("int")).alias("kept_n"),
        F.count(F.lit(1)).alias("rows_n"),
    )
    assert stats.filter(F.col("kept_n") < 1).count() == 0
    kept_total = sd.filter("kept").count()
    # 10 exact copies of each base vector: at most n survivors.
    assert 0 < kept_total <= n
