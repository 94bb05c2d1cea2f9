"""Analytics extension queries: pivot/unpivot reshaping, frame-bounded
window aggregation, and event-funnel analysis — the BI-layer shapes a
serving warehouse answers daily, all free in declarative Spark and all
value-hash-checked against DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deftunes_spark.driver_queries import _t, query

# =====================================================================
# Pivot / unpivot
# =====================================================================

_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
           AS status_O,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
           AS status_F,
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
           AS status_P
FROM orders GROUP BY 1
"""


@query("pivot_sales", _PIVOT_ORACLE)
def q_pivot_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order totals per priority × status. Spark's
    pivot with an EXPLICIT value list compiles to the same one-pass
    conditional aggregation as the oracle — never pass an implicit
    list at scale (it triggers a distinct-values pre-query)."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast(
                "double"
            )
        )
    )
    return piv.select(
        "o_orderpriority",
        F.col("O").alias("status_O"),
        F.col("F").alias("status_F"),
        F.col("P").alias("status_P"),
    )


_UNPIVOT_ORACLE = """
SELECT o_orderkey, 'o_totalprice' AS metric,
       CAST(o_totalprice AS DOUBLE) AS value
FROM orders
UNION ALL
SELECT o_orderkey, 'o_custkey' AS metric,
       CAST(o_custkey AS DOUBLE) AS value
FROM orders
"""


@query("unpivot_metrics", _UNPIVOT_ORACLE)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long / melt): per-order metric rows via Spark's
    native unpivot (Expand node — one scan, rows×metrics output, no
    join)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.col("o_custkey").cast("double").alias("o_custkey"),
    )
    return o.unpivot(
        ["o_orderkey"],
        ["o_totalprice", "o_custkey"],
        "metric",
        "value",
    )


# =====================================================================
# Frame-bounded window aggregation
# =====================================================================

_MOVAVG_ORACLE = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            AS DOUBLE)
       / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
           AS moving_avg
FROM events
"""


@query("moving_average", _MOVAVG_ORACLE)
def q_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 4-row moving average per user (decimal-exact sum over
    the frame ÷ frame count, so the metric is partition-order-proof).
    One shuffle on user_id; the frame scan is a running in-partition
    pass."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


# =====================================================================
# Funnel analysis
# =====================================================================

_FUNNEL_ORACLE = """
WITH v AS (
    SELECT user_id, MIN(ts) AS t FROM events
    WHERE event_type = 'view' GROUP BY 1
), c AS (
    SELECT e.user_id, MIN(e.ts) AS t
    FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
    WHERE e.event_type = 'click' GROUP BY 1
), p AS (
    SELECT e.user_id, MIN(e.ts) AS t
    FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
    WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
UNION ALL
SELECT 'click' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM c
UNION ALL
SELECT 'purchase' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM p
"""


def _first_after(
    events: DataFrame, etype: str, prior: DataFrame | None
) -> DataFrame:
    """min(ts) of ``etype`` per user, restricted to after the user's
    ``prior`` stage timestamp (ordered-funnel semantics)."""
    ev = events.filter(F.col("event_type") == etype)
    if prior is not None:
        ev = ev.join(prior, "user_id").where(F.col("ts") > F.col("t")).drop(
            "t"
        )
    return ev.groupBy("user_id").agg(F.min("ts").alias("t"))


@query("funnel_counts", _FUNNEL_ORACLE)
def q_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: each stage is the user's
    first qualifying event AFTER their previous stage. Three keyed
    aggregations chained by broadcast-or-hash joins on user_id."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = _first_after(ev, "view", None)
    c = _first_after(ev, "click", v)
    p = _first_after(ev, "purchase", c)

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )

    return (
        stage(v, "view").unionByName(stage(c, "click")).unionByName(
            stage(p, "purchase")
        )
    )
