"""Driver queries for the temporal join operators (ext/joins.py):
as-of join and binned range join over the events table. DuckDB has a
native ASOF JOIN, so the custom operator gets a full value-hash oracle
rather than a rows-only check."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deftunes_spark.driver_queries import _t, query
from deftunes_spark.ext.joins import asof_join, range_join


def _clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("click_ts"),
        )
    )


def _views(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            F.col("value").alias("view_value"),
        )
    )


_ASOF_ORACLE = """
SELECT c.event_id, c.user_id, c.ts AS click_ts,
       v.ts AS view_ts, v.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


@query("asof_join_click_view", _ASOF_ORACLE)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click gets the same user's latest view at or
    before it (pandas merge_asof semantics, built from an equi-join on
    user_id + per-click window rank — checked against DuckDB's native
    ASOF JOIN)."""
    out = asof_join(
        _clicks(spark, sf_dir),
        _views(spark, sf_dir),
        ["user_id"],
        "click_ts",
        "view_ts",
    )
    return out.select(
        "event_id", "user_id", "click_ts", "view_ts", "view_value"
    )


_RANGE_ORACLE = """
SELECT c.event_id,
       CAST(COUNT(*) AS BIGINT) AS n_views,
       CAST(SUM(CAST(v.value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id
 AND v.ts > c.ts - INTERVAL 1 HOUR AND v.ts <= c.ts
GROUP BY 1
"""


@query("range_join_1h", _RANGE_ORACLE)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join: views inside each click's trailing 1-hour
    window, as an equi-join on (user_id, time-bin) — no nested loop —
    then per-click count/sum."""
    clicks = _clicks(spark, sf_dir).withColumn(
        "lo_ts", F.col("click_ts") - F.expr("INTERVAL 1 HOUR")
    )
    joined = range_join(
        clicks,
        _views(spark, sf_dir),
        "lo_ts",
        "click_ts",
        "view_ts",
        keys=["user_id"],
        bin_seconds=3600,
    )
    return joined.groupBy("event_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_views"),
        F.sum(F.col("view_value").cast("decimal(18,4)"))
        .cast("double")
        .alias("value_sum"),
    )
