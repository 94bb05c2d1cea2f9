"""OLAP extension queries: multi-level aggregation (ROLLUP/CUBE) and
one-pass table profiling.

The reference's aggregation surface stops at plain GROUP BY (SURVEY
§2.5); these come free with Spark's declarative API and are staples of
the BI layer the reference's dbt views feed. Grouping-set results are
keyed by GROUPING_ID so subtotal rows are distinguishable from data
rows whose key happens to be NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deftunes_spark.driver_queries import _t, _t_cpu, query
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


# =====================================================================
# Quantile profile — exact interpolated percentiles
# =====================================================================

_QUANTILE_ORACLE = """
SELECT CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS q25,
       CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS q50,
       CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE) AS q75,
       CAST(quantile_cont(l_quantity, 0.99) AS DOUBLE) AS q99
FROM lineitem
"""


@query("quantile_profile", _QUANTILE_ORACLE)
def q_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (same k=p·(n−1) definition as
    SQL quantile_cont). Scale path: approx_percentile (t-digest
    sketch, no sorted collect) once exactness stops mattering."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        *[
            F.expr(f"percentile(l_quantity, {p})")
            .cast("double")
            .alias(f"q{int(p * 100)}")
            for p in (0.25, 0.5, 0.75, 0.99)
        ]
    )


# =====================================================================
# Corpus curation — the end-to-end training-data pipeline shape
# =====================================================================


def _curation_oracle() -> str:
    from deftunes_spark.driver_queries_ext import (
        QSCORE_SQL,
        TOK_SQL,
        _lang_oracle,
    )

    return f"""
    WITH lang AS ({_lang_oracle()}),
    scored AS (
        SELECT doc_id,
               {QSCORE_SQL} AS quality_score,
               CAST({TOK_SQL} AS BIGINT) AS token_count,
               md5(lower(regexp_replace(trim(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))
                   AS fp
        FROM documents
    ),
    kept AS (
        SELECT s.doc_id, s.quality_score, s.token_count, l.lang_pred,
               ROW_NUMBER() OVER (PARTITION BY s.fp ORDER BY s.doc_id)
                   AS rn
        FROM scored s JOIN lang l ON s.doc_id = l.doc_id
        WHERE s.quality_score >= 0.5
    )
    SELECT lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(token_count) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)
               AS quality_sum
    FROM kept WHERE rn = 1
    GROUP BY 1
    """


@query("corpus_curation", _curation_oracle())
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pass over documents — quality-filter →
    exact-dedup (keep lowest doc_id per fingerprint) → per-language
    doc/token stats. ONE scan feeds scoring+lang-id+fingerprint (all
    column functions), then one window for dedup and one group-by:
    the whole curation is two shuffles regardless of corpus size."""
    from pyspark.sql.window import Window

    from deftunes_spark.ext import text as X

    docs = _t_cpu(spark, sf_dir, "documents")
    scored = X.with_fingerprint(
        X.with_lang_id(X.with_token_count(X.with_quality_score(docs)))
    )
    kept = (
        scored.filter(F.col("quality_score") >= 0.5)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("normalized_fingerprint").orderBy(
                    "doc_id"
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return kept.groupBy("lang_pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("token_count").cast("bigint").alias("total_tokens"),
        F.sum(F.col("quality_score").cast("decimal(18,6)"))
        .cast("double")
        .alias("quality_sum"),
    )


# =====================================================================
# RANGE-frame time window: trailing 7-day sales per customer
# =====================================================================

_TRAILING_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_7d
FROM orders
"""


@query("trailing_7d_sales", _TRAILING_ORACLE)
def q_trailing_7d_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window over event time (the frame family
    ``moving_average``'s ROWS frame doesn't cover): per customer, the
    trailing-7-day revenue at each order. The frame is value-based, so
    same-timestamp peers all join the frame — identical peer semantics
    in both engines. One Exchange on o_custkey + one sort; the frame
    sum itself is a running in-memory pass per partition. Sums go
    through DECIMAL(18,4) so frame-internal addition order can't
    wiggle a double."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d"),
    )
