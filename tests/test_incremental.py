"""Incremental aggregate maintenance and snapshot-diff CDC."""

from __future__ import annotations

from pyspark.sql import functions as F

from deftunes_spark.ext.incremental import (
    merge_partials,
    partial_agg,
    snapshot_diff,
)


def _orders(spark, n=300):
    return spark.range(n).selectExpr(
        "id AS k",
        "CAST(id % 5 AS STRING) AS grp",
        "CAST(id AS DOUBLE) / 7 AS amount",
    )


def test_merge_partials_equals_full_recompute(spark):
    df = _orders(spark)
    full = {
        (r.grp,): (r.n, float(r.amount_sum))
        for r in partial_agg(df, ["grp"], ["amount"]).collect()
    }
    # Split three ways on an arbitrary predicate, aggregate each
    # shard alone, merge — must equal the one-shot aggregate exactly
    # (decimal partials: associative, partition-order-proof).
    shards = [
        partial_agg(df.filter(F.col("k") % 3 == i), ["grp"], ["amount"])
        for i in range(3)
    ]
    merged = {
        (r.grp,): (r.n, float(r.amount_sum))
        for r in merge_partials(shards, ["grp"], ["amount"]).collect()
    }
    assert merged == full


def test_merge_partials_with_empty_increment(spark):
    df = _orders(spark, 50)
    base = partial_agg(df, ["grp"], ["amount"])
    empty = partial_agg(df.filter(F.lit(False)), ["grp"], ["amount"])
    merged = merge_partials([base, empty], ["grp"], ["amount"])
    assert {
        tuple(r) for r in merged.collect()
    } == {tuple(r) for r in base.collect()}


def test_snapshot_diff_classifies_all_four(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (5, 50.0, None)],
        "k int, v double, s string",
    )
    new = spark.createDataFrame(
        [(2, 20.0, "b"), (3, 31.0, "c"), (4, 40.0, "d"), (5, 50.0, "x")],
        "k int, v double, s string",
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"], ["v", "s"]).collect()
    }
    assert got == {
        1: "delete",
        2: "unchanged",
        3: "update",
        4: "insert",
        5: "update",  # NULL -> 'x' is an update (null-safe compare)
    }


def test_snapshot_diff_values_come_from_new_side(spark):
    old = spark.createDataFrame([(1, 10.0)], "k int, v double")
    new = spark.createDataFrame([(1, 99.0)], "k int, v double")
    row = snapshot_diff(old, new, ["k"], ["v"]).collect()[0]
    assert row.v == 99.0 and row.change_type == "update"
    # Deletes carry the old-side values (the only ones that exist).
    old2 = spark.createDataFrame([(7, 70.0)], "k int, v double")
    new2 = spark.createDataFrame([], "k int, v double")
    row2 = snapshot_diff(old2, new2, ["k"], ["v"]).collect()[0]
    assert row2.k == 7 and row2.v == 70.0 and row2.change_type == "delete"
