"""Regression tests for the r9 ADVICE findings fixed in round 10:
NULL-cluster rows must never reach the grouped BLAS kernels, and the
init-race loser's wait deadline is a parameter with non-destructive
recovery guidance."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _emb_with_null_element(spark):
    # Four valid vectors in two well-separated clusters plus one
    # vector with a NULL element — the arrow ivf path masks it to a
    # NULL assignment instead of crashing (r9 fix), which made
    # NULL-cluster groups reachable in the grouped kernels.
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [0.1, 0.9]),
        (5, [1.0, None]),
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_knn_join_grouped_drops_null_cluster_rows(spark):
    from deftunes_spark.ext.similarity import knn_join_grouped

    df = _emb_with_null_element(spark)
    out = knn_join_grouped(
        df, [[1.0, 0.0], [0.0, 1.0]], k=2
    ).collect()
    ids = {r["vec_id"] for r in out}
    # The kernel ran (no ragged-matrix einsum crash) and the
    # NULL-assignment row neither queries nor serves as a neighbor.
    assert 5 not in ids
    assert not any(r["neighbor_id"] == 5 for r in out)
    assert ids == {1, 2, 3, 4}


def test_semantic_dedup_grouped_keeps_null_cluster_rows(spark):
    from deftunes_spark.ext.curation import semantic_dedup

    df = _emb_with_null_element(spark)
    out = semantic_dedup(
        df,
        [[1.0, 0.0], [0.0, 1.0]],
        threshold=0.95,
        method="grouped",
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    # Output parity with the expr path: the NULL-assignment row stays
    # in the output relation (kept — it dominates nothing and nothing
    # dominates it), it just never enters the pair kernel.
    assert by_id[5]["cluster"] is None
    assert by_id[5]["kept"] is True
    # Near-duplicate in cluster 0 still detected.
    assert by_id[2]["kept"] is False


def test_init_wait_is_a_parameter_and_recovery_warns(spark, tmp_path):
    import os

    from deftunes_spark.ext import similarity as S

    store = str(tmp_path / "store_wait")
    os.makedirs(store, exist_ok=True)
    open(os.path.join(store, "_ivf_init.marker"), "w").close()
    batch = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(RuntimeError) as exc:
        S.incremental_ivf_assign(
            spark,
            batch,
            store,
            centroids=[[0.0, 0.0]],
            init_wait_sec=0.3,
        )
    msg = str(exc.value)
    assert "0.3s" in msg                       # parameterized deadline
    assert "CONFIRM the winner process is dead" in msg
    assert "init_wait_sec" in msg              # non-destructive option
