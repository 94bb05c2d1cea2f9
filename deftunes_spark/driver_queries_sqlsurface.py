"""SQL-surface completeness queries: the relational shapes the rest of
the registry doesn't yet exercise as first-class entries.

- FULL OUTER join (the only join type missing from the
  inner/left/semi/anti/asof/range family)
- correlated subqueries (scalar aggregate + EXISTS + NOT EXISTS),
  expressed Spark-first as the joins Catalyst decorrelates them into:
  broadcast scalar cross-join, left-semi, left-anti
- the remaining rank-family window functions
  (percent_rank / cume_dist / lag / lead in one pass)
- MapType round trip: JSON props → map<string,int> → entry explode →
  aggregate (the semi-structured path ``variant_json_agg`` covers for
  structs, here for maps)
- the value-family window functions (first/last/nth_value) with the
  UNBOUNDED FOLLOWING frames they require

All five carry full DuckDB value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deftunes_spark.driver_queries import _t, query


@query(
    "join_full_outer",
    """
    WITH c AS (
        SELECT c_nationkey AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_rich_cust
        FROM customer WHERE c_acctbal > 9800 GROUP BY 1
    ), s AS (
        SELECT s_nationkey AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_rich_supp
        FROM supplier WHERE s_acctbal > 4000 GROUP BY 1
    )
    SELECT CAST(COALESCE(c.nationkey, s.nationkey) AS INT) AS nationkey,
           COALESCE(c.n_rich_cust, 0) AS n_rich_cust,
           COALESCE(s.n_rich_supp, 0) AS n_rich_supp
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated per-nation profiles whose
    filters cover different nation subsets — both unmatched sides are
    exercised. Aggregating BEFORE the join keeps the outer join
    key-unique (no row explosion) and shrinks the shuffle to
    #nations rows; at 100 TB the same shape is two map-side-combined
    aggs followed by a tiny sort-merge."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9800)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rich_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 4000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rich_supp"))
    )
    j = c.join(s, "nationkey", "full_outer")
    return j.select(
        F.col("nationkey").cast("int").alias("nationkey"),
        F.coalesce("n_rich_cust", F.lit(0)).alias("n_rich_cust"),
        F.coalesce("n_rich_supp", F.lit(0)).alias("n_rich_supp"),
    )


@query(
    "subquery_decorrelate",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
)
def q_subquery_decorrelate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + EXISTS + NOT EXISTS subqueries, written as the plan
    Catalyst decorrelates them into: a broadcast 1-row cross join for
    the scalar aggregate (no per-row re-evaluation), LEFT SEMI for
    EXISTS, LEFT ANTI for NOT EXISTS. Semi/anti never replicate
    matched rows, so the output cardinality is bounded by the customer
    side regardless of orders fan-out — the property that makes this
    shape safe at 100 TB where a rewrite through a plain join + dedup
    would shuffle the fact table twice."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.agg(F.avg("c_acctbal").alias("_avg_bal"))
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_avg_bal")
    )
    with_orders = rich.join(
        orders.select("o_custkey"),
        rich["c_custkey"] == F.col("o_custkey"),
        "left_semi",
    )
    no_failed = with_orders.join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_custkey"),
        with_orders["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    )
    return no_failed.select("c_custkey", "c_mktsegment", "c_acctbal")


@query(
    "window_rank_suite",
    """
    SELECT c_custkey, c_mktsegment,
           round(percent_rank() OVER w, 6) AS bal_pct_rank,
           round(cume_dist() OVER w, 6) AS bal_cume_dist,
           round(c_acctbal
                 - lag(c_acctbal, 1, c_acctbal) OVER w, 2) AS gap_prev,
           round(lead(c_acctbal, 1, c_acctbal) OVER w
                 - c_acctbal, 2) AS gap_next
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-family window functions the registry hadn't covered —
    percent_rank, cume_dist, lag, lead — in ONE window spec, so the
    physical plan is a single partition-by-segment sort feeding all
    four (no repeated Exchange/Sort per function). The window order
    tie-breaks on the unique key, making every output deterministic.
    percent_rank/cume_dist are exact integer ratios evaluated
    identically by both engines; rounding only guards the driver's
    value-hash."""
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    )
    bal = F.col("c_acctbal")
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
        F.round(bal - F.lag(bal, 1, None).over(w), 2).alias("gap_prev"),
        F.round(F.lead(bal, 1, None).over(w) - bal, 2).alias("gap_next"),
    ).withColumn(
        "gap_prev", F.coalesce("gap_prev", F.lit(0.0))
    ).withColumn(
        "gap_next", F.coalesce("gap_next", F.lit(0.0))
    )


@query(
    "map_props_agg",
    """
    WITH kv AS (
        SELECT event_type,
               unnest(json_keys(props)) AS prop_key,
               props
        FROM events
    )
    SELECT event_type, prop_key,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.' || prop_key)
                         AS INT)) AS BIGINT) AS total,
           CAST(MIN(CAST(json_extract_string(props, '$.' || prop_key)
                         AS INT)) AS INT) AS min_val,
           CAST(MAX(CAST(json_extract_string(props, '$.' || prop_key)
                         AS INT)) AS INT) AS max_val
    FROM kv
    GROUP BY 1, 2
    """,
)
def q_map_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round trip: parse the JSON props column into
    map<string,int> (schema-on-read for ragged keys — no struct schema
    to pin), explode the entries, aggregate per (event_type, key).
    from_json + explode stay whole-stage-codegen'd; only the final
    per-key agg shuffles, on #event_types × #keys groups."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    kv = ev.select(
        "event_type", F.explode(m).alias("prop_key", "prop_val")
    )
    return kv.groupBy("event_type", "prop_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("prop_val").cast("bigint").alias("total"),
        F.min("prop_val").cast("int").alias("min_val"),
        F.max("prop_val").cast("int").alias("max_val"),
    )


@query(
    "window_value_suite",
    """
    SELECT c_nationkey,
           first_value(c_custkey) OVER w AS poorest_cust,
           last_value(c_custkey) OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS richest_cust,
           nth_value(c_custkey, 2) OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS second_poorest,
           c_custkey
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_value_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-family window functions (first/last/nth_value) the
    rank suite doesn't cover, with the frame subtlety they exist to
    teach: last_value/nth_value need an UNBOUNDED FOLLOWING frame (the
    default frame ends at CURRENT ROW, making last_value a no-op) —
    identical frame semantics in both engines. One partition sort
    serves all three; tie-break on the unique key keeps every output
    deterministic."""
    full = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal"), F.col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    grow = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")
    )
    return _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.first("c_custkey").over(grow).alias("poorest_cust"),
        F.last("c_custkey").over(full).alias("richest_cust"),
        F.nth_value("c_custkey", 2).over(full).alias("second_poorest"),
        "c_custkey",
    )
