"""Driver queries for the scale-out helpers (ext/scale.py).

The reference delegates all physical planning to Catalyst/Redshift
(SURVEY §4); these queries prove the explicit skew-mitigation rewrites
produce results identical to the plain plans — the oracle for a salted
aggregate IS the unsalted GROUP BY, and the oracle for a salted join IS
the plain join. At 100 TB these rewrites are what you reach for when
AQE's skew handling isn't enough (single hot key in a shuffle agg, hot
key joining a not-broadcastable side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deftunes_spark.driver_queries import _t, query
from deftunes_spark.ext.scale import approx_uniqueness, salted_join, salted_sum

# =====================================================================
# Salted aggregation — identical result to plain groupBy/sum
# =====================================================================

_SALTED_SUM_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_sum
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@query("salted_sum_agg", _SALTED_SUM_ORACLE)
def q_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted SUM on (l_returnflag, l_linestatus) — a 3-value
    grouping key is exactly the hot-key shape that melts one reducer at
    100 TB; decimal partial sums keep the result bit-identical to the
    single-stage plan (transform jobs rely on the same associativity,
    transform-json-job.py:156-187 append order)."""
    li = _t(spark, sf_dir, "lineitem")
    return salted_sum(
        li,
        ["l_returnflag", "l_linestatus"],
        "l_quantity",
        out_col="qty_sum",
    )


# =====================================================================
# Salted join — identical result to the plain equi-join
# =====================================================================

_SALTED_JOIN_ORACLE = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS acctbal_sum
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@query("salted_join_agg", _SALTED_JOIN_ORACLE)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-join rewrite: salt the big (supplier) side, replicate the
    25-row nation side per salt, join on (key, salt). Result equals the
    plain inner join (J1 shape, sales_per_artist_vw.sql:5-7) — the
    rewrite only changes row placement, never membership."""
    supp = _t(spark, sf_dir, "supplier").withColumnRenamed(
        "s_nationkey", "nationkey"
    )
    nat = _t(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "nationkey"
    )
    joined = salted_join(supp, nat, "nationkey", n_salt=4)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum(F.col("s_acctbal").cast("decimal(18,4)"))
        .cast("double")
        .alias("acctbal_sum"),
    )


# =====================================================================
# Approximate distinct — HLL++ scale path of DQDL Uniqueness (A4)
# =====================================================================

_APPROX_UNIQ_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_exact,
       TRUE AS approx_ok
FROM orders
"""


@query("approx_uniqueness", _APPROX_UNIQ_ORACLE)
def q_approx_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct as the 100 TB path of DQDL Uniqueness
    (data_quality/glue.tf:21): no key shuffle, kilobyte sketches merged
    on the driver. The query asserts the sketch lands within 3×rsd of
    the exact count (deterministic — HLL hashing has no RNG)."""
    orders = _t(spark, sf_dir, "orders")
    # include_exact: the ORACLE shape (sketch checked against exact);
    # the production default emits only the sketch.
    return approx_uniqueness(
        orders, "o_custkey", rsd=0.05, include_exact=True
    ).select("n_rows", "n_distinct_exact", "approx_ok")


# =====================================================================
# Z-order (Morton) clustering — multi-dimensional data skipping
# =====================================================================


def _zorder_oracle() -> str:
    from deftunes_spark.ext.layout import zvalue_sql

    z = zvalue_sql(["l_partkey", "l_suppkey"], bits=12)
    return f"""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST({z} AS BIGINT) AS zval
    FROM lineitem
    """


@query("zorder_cluster", _zorder_oracle())
def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order clustering key over (l_partkey, l_suppkey): the
    bit-interleave expression (ext/layout.py, single source of truth
    for Spark AND the oracle) that ``zorder_write`` range-partitions
    and sorts by, so per-file min-max stats prune scans on EITHER key.
    The layout effect itself (per-file key spans shrinking vs a
    single-key sort) is asserted in tests/test_layout.py; this query
    value-checks the curve arithmetic per row."""
    from deftunes_spark.ext.layout import zvalue_col

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        zvalue_col(["l_partkey", "l_suppkey"], bits=12)
        .cast("bigint")
        .alias("zval"),
    )
