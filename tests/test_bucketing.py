"""Bucketed tables kill the join shuffle: both sides bucketed on the
join key → SortMergeJoin with no Exchange in the plan (the 100 TB
fact×fact strategy, SCALE.md)."""

from __future__ import annotations

import pytest

from deftunes_spark.io.writers import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    a = spark.range(0, 10000).selectExpr("id AS k", "id % 7 AS va")
    b = spark.range(0, 10000, 2).selectExpr("id AS k", "id % 3 AS vb")
    write_bucketed_table(a, "bkt_a", "k", n_buckets=8, sort_col="k")
    write_bucketed_table(b, "bkt_b", "k", n_buckets=8, sort_col="k")
    yield spark.table("bkt_a"), spark.table("bkt_b")
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair):
    a, _ = bucketed_pair
    agg = a.groupBy("k").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() == 10000
