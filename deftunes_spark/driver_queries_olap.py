"""OLAP extension queries: multi-level aggregation (ROLLUP/CUBE) and
one-pass table profiling.

The reference's aggregation surface stops at plain GROUP BY (SURVEY
§2.5); these come free with Spark's declarative API and are staples of
the BI layer the reference's dbt views feed. Grouping-set results are
keyed by GROUPING_ID so subtotal rows are distinguishable from data
rows whose key happens to be NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deftunes_spark.driver_queries import _t, query
from deftunes_spark.ext.profile import profile_columns

_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_sum
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("rollup_agg", _ROLLUP_ORACLE)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): per-pair, per-flag and
    grand-total rows from one shuffle (Spark expands grouping sets
    map-side — no extra scan per level)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("double")
        .alias("qty_sum"),
    )


_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           AS price_sum
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("cube_agg", _CUBE_ORACLE)
def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one pass."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("price_sum"),
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
    "o_orderdate",
]


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_val,
               CAST(MAX({c}) AS VARCHAR) AS max_val
        FROM orders
        """
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@query("profile_table", _profile_oracle())
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of orders (nulls / cardinality / range
    per column) — the first query a training pipeline runs on a new
    100 TB table."""
    o = _t(spark, sf_dir, "orders")
    df = profile_columns(o, _PROFILE_COLS)
    # o_orderdate surfaces as timestamp in parquet; DuckDB renders its
    # VARCHAR cast with the time part too, so formats already agree.
    return df
