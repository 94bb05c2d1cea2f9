"""Regression tests for the round-6 advisor findings: grouped-knn
-inf/self rows on duplicate-id small clusters, lost-race detection by
Java exception class (not message substring), KMV uniform clamp, and
heavy-hitters sample-threshold validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_knn_grouped_small_cluster_duplicate_ids_no_inf(spark):
    """Repro from the advisory: ids [1, 1, 2] in one cluster with
    k=3 — kk >= the number of finite candidates, so the kth value
    from np.partition is -inf and masked equal-id entries used to
    fill the top-k tail as (1, 1, -inf) rows. Output must carry no
    self rows and no non-finite sims."""
    from deftunes_spark.ext.similarity import knn_join, knn_join_grouped

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    cents = [[1.0, 0.0]]  # single cluster
    rows = knn_join_grouped(df, cents, k=3).collect()
    assert rows, "expected cross-id neighbor rows"
    for r in rows:
        assert r.vec_id != r.neighbor_id
        assert r.cosine_sim is not None
        assert abs(r.cosine_sim) <= 1.0 + 1e-9  # finite, in range
    # Pair-set parity with the expr path. (Exact RANK parity is not
    # defined under duplicate ids: the window path partitions by id so
    # the two physical id=1 rows share one ranking — (1,2) appears at
    # ranks 1 AND 2 — while the grouped kernel ranks per physical row.
    # Unique-id rank parity is covered by test_similarity.)
    expr_rows = {
        (r.vec_id, r.neighbor_id)
        for r in knn_join(df, cents, k=3).collect()
    }
    grouped_rows = {(r.vec_id, r.neighbor_id) for r in rows}
    assert grouped_rows == expr_rows


class _FakeJavaClass:
    def __init__(self, name: str):
        self._name = name

    def getName(self):
        return self._name


class _FakeJavaExc:
    def __init__(self, name: str, cause=None):
        self._cls = _FakeJavaClass(name)
        self._cause = cause

    def getClass(self):
        return self._cls

    def getCause(self):
        return self._cause


class _FakePy4JError(Exception):
    def __init__(self, java_exception, message: str):
        super().__init__(message)
        self.java_exception = java_exception


def test_java_exc_class_match_not_message_substring():
    """An IOException whose rendered trace MENTIONS
    FileAlreadyExistsException (e.g. in a suppressed frame) must not
    be classified as a lost race; a real FileAlreadyExistsException
    — direct or via getCause — must."""
    from deftunes_spark.io.versioned import _java_exc_is

    target = "java.nio.file.FileAlreadyExistsException"
    direct = _FakePy4JError(_FakeJavaExc(target), "boom")
    assert _java_exc_is(direct, target)
    caused = _FakePy4JError(
        _FakeJavaExc("java.io.IOException", _FakeJavaExc(target)),
        "boom",
    )
    assert _java_exc_is(caused, target)
    # Message mentions the class, Java class is unrelated → NOT a race.
    liar = _FakePy4JError(
        _FakeJavaExc("java.io.IOException"),
        "disk full while writing; see FileAlreadyExistsException note",
    )
    assert not _java_exc_is(liar, target)
    # Plain Python exception (no java_exception) → never a race.
    assert not _java_exc_is(ValueError(target), target)


def test_kmv_uniform_clamped_strictly_positive(spark):
    """h == -2^63 maps to raw u = 0; the clamp must keep u > 0 so
    (k-1)/u stays finite. Max stays at 1 (= (2^63-1)/2^64 + 0.5 up to
    double rounding)."""
    from deftunes_spark.ext.curation import kmv_uniform

    df = spark.createDataFrame(
        [(-(2**63),), (0,), (2**63 - 1,)], ["h"]
    )
    vals = [
        r.u
        for r in df.select(kmv_uniform(F.col("h")).alias("u"))
        .orderBy("h")
        .collect()
    ]
    assert vals[0] > 0.0  # clamped, not 0
    assert vals[0] == pytest.approx(2.0**-64)
    assert vals[1] == pytest.approx(0.5)
    assert 0.0 < vals[2] <= 1.0
    assert all(v > 0.0 for v in vals)


def test_heavy_hitters_threshold_validated(spark):
    """Malformed sample thresholds must raise, not silently change
    the sample rate: raw-string compare vs lowercase md5 hex means
    '3333' (short) ~0% and '0X...'/uppercase sample ~everything."""
    from deftunes_spark.ext.profile import heavy_hitters_cms

    df = spark.createDataFrame([(1, "a")], ["doc_id", "item"])
    for bad in ["3333", "0X123456", "33333333AB", "ZZZZZZZZ", "3333333G"]:
        with pytest.raises(ValueError, match="sample_hex_threshold"):
            heavy_hitters_cms(
                df, "doc_id", "item", sample_hex_threshold=bad
            )
    # Well-formed lowercase hex still accepted (lazy build, no action).
    heavy_hitters_cms(df, "doc_id", "item", sample_hex_threshold="0f0f0f0f")
