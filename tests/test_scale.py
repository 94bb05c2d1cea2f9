"""Tests for ext/scale.py — the skew/sketch rewrites must be invisible
in the result: salted plans equal their plain-plan twins exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deftunes_spark.ext.scale import approx_uniqueness, salted_join, salted_sum


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one hot key — the shape that melts a reducer."""
    rows = [("hot" if i % 10 else f"cold{i}", "A" if i % 2 else "B", float(i % 7))
            for i in range(2000)]
    return spark.createDataFrame(rows, ["k", "sub", "v"])


def test_salted_sum_matches_plain(skewed):
    plain = {
        (r.k, r.sub): r.s
        for r in skewed.groupBy("k", "sub")
        .agg(F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("s"))
        .collect()
    }
    salted = {
        (r.k, r.sub): r.v_sum
        for r in salted_sum(skewed, ["k", "sub"], "v", n_salt=8).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT")] + [(f"cold{i}", f"C{i}") for i in range(1, 2000, 10)],
        ["k", "label"],
    )
    plain = sorted(
        (r.k, r.sub, r.v, r.label)
        for r in skewed.join(dim, "k").collect()
    )
    salted = sorted(
        (r.k, r.sub, r.v, r.label)
        for r in salted_join(skewed, dim, "k", n_salt=4).collect()
    )
    assert salted == plain


def test_approx_uniqueness(spark):
    df = spark.createDataFrame(
        [(i % 500,) for i in range(5000)], ["uid"]
    )
    row = approx_uniqueness(
        df, "uid", rsd=0.05, include_exact=True
    ).collect()[0]
    assert row.n_rows == 5000
    assert row.n_distinct_exact == 500
    assert row.approx_ok
    # Production shape: sketch only, no exact-distinct expand.
    prod = approx_uniqueness(df, "uid", rsd=0.05)
    assert prod.columns == ["n_rows", "n_distinct_approx"]
    assert "Expand" not in prod._jdf.queryExecution().executedPlan().toString()
