"""Regression tests for the round-5 advisor findings: zero-norm
cosine guards, compaction auto-stats vs dropped columns, type-mismatch
pruning degradation, and reclaim-grave vacuum."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F


def test_cosine_to_query_zero_norm_is_null_not_crash(spark):
    """ANSI mode raises DIVIDE_BY_ZERO on a zero-norm embedding; the
    guard must NULL the similarity instead, so top-k ranks the row
    last rather than killing the job."""
    from deftunes_spark.ext.similarity import cosine_to_query, cosine_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.6, 0.8])],
        ["vec_id", "embedding"],
    )
    rows = {
        r.vec_id: r.cosine_sim
        for r in cosine_to_query(df, [1.0, 0.0]).collect()
    }
    assert rows[2] is None and rows[1] == pytest.approx(1.0)
    top = cosine_topk(df, [1.0, 0.0], k=3).collect()
    assert [r.vec_id for r in top] == [1, 3, 2]  # zero-norm last


def test_neardup_pairs_zero_norm_pair_dropped(spark):
    """A zero-norm vector sharing an LSH bucket must not crash the
    pair join; its pairs drop out via the NULL-threshold filter."""
    from deftunes_spark.ext.similarity import cosine_neardup_pairs

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.99, 0.01])],
        ["vec_id", "embedding"],
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in cosine_neardup_pairs(df, threshold=0.9, n_bits=1).collect()
    }
    assert (1, 3) in pairs
    assert all(2 not in p for p in pairs)


def test_compact_auto_stats_survives_dropped_column(spark, tmp_path):
    """stats_cols='auto' unions historical manifests' stats columns; a
    column dropped by a later overwrite must be skipped, not fed to
    F.min() on the current snapshot (AnalysisException)."""
    from deftunes_spark.io.versioned import (
        compact_versioned,
        read_version,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "old_col"])
    write_versioned(spark, df1, path, stats_cols=["k", "old_col"])
    df2 = spark.createDataFrame([(3, "x"), (4, "y")], ["k", "new_col"])
    write_versioned(spark, df2, path, mode="overwrite", stats_cols=["k"])
    res = compact_versioned(spark, path, stats_cols="auto")
    assert res["new_version"] > res["base_version"]
    got = sorted(r.k for r in read_version(spark, path).collect())
    assert got == [3, 4]


def test_pruned_read_type_mismatch_degrades_to_scan(spark):
    """String stats vs numeric bounds must include the file
    conservatively, not raise TypeError through the read."""
    from deftunes_spark.io.versioned import _plan_pruned

    chosen = {"data_dirs": ["/t/_v1"], "version": 1}
    versions = [
        {
            "version": 1,
            "data_dir": "/t/_v1",
            "data_dirs": ["/t/_v1"],
            "file_stats": {"/t/_v1/f1.parquet": {"k": ["a", "z"]}},
        }
    ]
    files, total = _plan_pruned(versions, chosen, "k", 5, 10)
    assert files == ["/t/_v1/f1.parquet"] and total == 1


def test_vacuum_removes_aged_reclaim_graves(spark, tmp_path):
    """A reclaimer crashing between rename(lock, grave) and
    delete(grave) leaks a .reclaim-* file in _manifests forever;
    vacuum_orphans must collect it once aged past the grace period."""
    import os

    from deftunes_spark.io.versioned import vacuum_orphans, write_versioned

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1,)], ["k"])
    write_versioned(spark, df, path)
    grave = os.path.join(path, "_manifests", ".reclaim-deadbeef")
    with open(grave, "w") as f:
        f.write("00000000000000000003.json\n")
    old = time.time() - 48 * 3600
    os.utime(grave, (old, old))
    fresh = os.path.join(path, "_manifests", ".reclaim-cafebabe")
    with open(fresh, "w") as f:
        f.write("x")
    deleted = vacuum_orphans(spark, path, grace_ms=24 * 3600 * 1000)
    assert any(d.endswith(".reclaim-deadbeef") for d in deleted)
    assert not os.path.exists(grave)
    assert os.path.exists(fresh)  # inside grace — a live reclaimer
