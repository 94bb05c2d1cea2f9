"""Driver-checkable query registry (SURVEY §2 inventory → queries()).

Every entry pairs a Spark implementation (built on the engine modules)
with a DuckDB-runnable ANSI oracle over the same parquet tables.
Conventions that keep the order-insensitive value hash stable:

- integer outputs cast to BIGINT on both sides (DuckDB SUM(int) would
  otherwise widen to HUGEINT);
- money sums go through DECIMAL(18,4) then DOUBLE — decimal addition
  is exact/associative, so results don't depend on partition order;
- every computed column is aliased identically on both sides;
- session timezone is pinned to UTC inside each query (the driver owns
  the SparkSession; timestamp semantics must not depend on its tz).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deftunes_spark.io.readers import (
    load_table,
    read_csv_landing,
    read_json_landing,
)
from deftunes_spark.io.writers import write_landing_csv, write_landing_json
from deftunes_spark.models.star import sales_per_artist, sales_per_country
from deftunes_spark.quality.evaluator import evaluate_ruleset
from deftunes_spark.quality.rules import Rule
from deftunes_spark.transforms.deftunes import add_lineage_columns

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _utc(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    return load_table(spark, sf_dir, name)


def _t_cpu(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table for a CPU-bound per-row pipeline (regex scoring,
    hashing, vector arithmetic), ensuring the scan parallelizes.

    The local testdata files are single-row-group parquet, so a scan is
    ONE input split — every downstream codegen stage runs on one of 32
    cores. A repartition of a few MB of text unlocks all cores for ~30×
    on the regex-heavy queries. At real scale the branch is a no-op:
    a 100 TB table yields far more splits than cores, and paying a full
    shuffle of the payload would be wrong — hence the guard, not an
    unconditional repartition."""
    df = _t(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if _scan_splits(f"{sf_dir}/{name}.parquet") < max(2, target // 2):
        df = df.repartition(target)
    return df


def _scan_splits(path: str) -> int:
    """Upper bound on scan parallelism: row-group count of the file
    (Spark splits by byte ranges, but one row group is always read by
    one task). Read from parquet footer metadata — microseconds — so
    the adaptivity check costs nothing; assume wide (no repartition)
    if the footer can't be read."""
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).num_row_groups
    except Exception:
        return 10**9


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet with a schema-tolerant ``ts``: some testdata
    generations store TIMESTAMP(NANOS) (which the Spark parquet reader
    rejects — read nanos as long, truncate to micros, exactly DuckDB's
    TIMESTAMP_NS→TIMESTAMP cast), others plain TIMESTAMP micros."""
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # Integer division — `/` would go through double and lose
        # exactness for nano epochs (~1.7e18 > 2^53).
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Already a timestamp (micros); normalize NTZ → session-local so the
    # downstream window/sessionize logic sees one type either way.
    return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))


# =====================================================================
# Core reference parity — BI views (J1/J2 + A1/A2 + F1/F2)
# =====================================================================


@query(
    "sales_per_artist",
    """
    SELECT CAST(year(l_shipdate) AS BIGINT) AS session_year,
           s_name AS artist_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_sales
    FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1, 2
    """,
)
def q_sales_per_artist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: bi_views/sales_per_artist_vw.sql on the testdata analog.

    lineitem ≈ exploded fact_session, supplier ≈ dim_artists
    (FIXTURES.md §B). Runs through models.star.sales_per_artist — the
    fact side never shuffles (dim broadcast), agg is map-side combined.
    """
    fact = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("artist_id"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_shipdate").alias("session_start_time"),
    )
    artists = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("artist_id"),
        F.col("s_name").alias("artist_name"),
    )
    return sales_per_artist(fact, artists)


@query(
    "sales_per_country",
    """
    SELECT CAST(month(o_orderdate) AS BIGINT) AS session_month,
           CAST(year(o_orderdate) AS BIGINT) AS session_year,
           u.country_code,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_sales
    FROM orders
    LEFT JOIN (
        SELECT c_custkey, n_name AS country_code
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) u ON o_custkey = u.c_custkey
    GROUP BY 1, 2, 3
    """,
)
def q_sales_per_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bi_views/sales_per_country_vw.sql analog: orders ≈ sessions,
    customer×nation ≈ dim_users (country_code = nation name)."""
    fact = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").alias("session_start_time"),
    )
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    users = customer.join(
        F.broadcast(nation),
        customer.c_nationkey == nation.n_nationkey,
    ).select(
        F.col("c_custkey").alias("user_id"),
        F.col("n_name").alias("country_code"),
    )
    return sales_per_country(fact, users)


@query(
    "dim_distinct",
    """
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def q_dim_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: dim_artists.sql SELECT DISTINCT dedup shape."""
    return (
        _t(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
    )


# =====================================================================
# Projection / row transforms (P1–P8, F3)
# =====================================================================


@query(
    "projection_rename",
    """
    SELECT l_orderkey AS order_id, l_linenumber AS line_no,
           l_extendedprice AS price
    FROM lineitem
    """,
)
def q_projection_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2: explicit select list with aliases
    (transform-json-job.py:115-129 shape)."""
    return _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_extendedprice").alias("price"),
    )


@query(
    "lineage_literals",
    """
    SELECT o_orderkey,
           DATE '2020-03-01' AS ingest_on,
           '2020-03-01T00:00:00' AS processing_timestamp,
           'postgres_rds' AS source_from
    FROM orders
    """,
)
def q_lineage_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/F3: lineage metadata columns via transforms.add_lineage_columns."""
    df = add_lineage_columns(
        _t(spark, sf_dir, "orders"),
        ingest_date="2020-03-01",
        processing_timestamp="2020-03-01T00:00:00",
        source_from="postgres_rds",
    )
    return df.select(
        "o_orderkey", "ingest_on", "processing_timestamp", "source_from"
    )


@query(
    "enforce_types",
    """
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS line_no_big,
           CAST(CAST(l_partkey AS VARCHAR) AS BIGINT) AS partkey_roundtrip,
           CAST(l_quantity AS DOUBLE) AS quantity_d
    FROM lineitem
    """,
)
def q_enforce_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: explicit cast enforcement (transform-songs-job.py:83-91 shape),
    incl. a string→numeric round-trip like the all-string CSV landing."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line_no_big"),
        F.col("l_partkey")
        .cast("string")
        .cast("bigint")
        .alias("partkey_roundtrip"),
        F.col("l_quantity").cast("double").alias("quantity_d"),
    )


@query(
    "array_index",
    """
    SELECT vec_id,
           CAST(embedding[1] AS DOUBLE) AS e0,
           CAST(embedding[64] AS DOUBLE) AS e63,
           CAST(len(embedding) AS INTEGER) AS dim
    FROM embeddings
    """,
)
def q_array_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/F7: positional array destructuring
    (user_location[i], transform-json-job.py:83-90)."""
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("e0"),
        F.col("embedding")[63].cast("double").alias("e63"),
        F.size("embedding").alias("dim"),
    )


@query(
    "drop_column",
    """
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
    """,
)
def q_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: .drop (transform-json-job.py:89)."""
    return _t(spark, sf_dir, "customer").drop("c_acctbal")


@query(
    "filter_pushdown",
    """
    SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_returnflag = 'R'
    GROUP BY 1
    """,
)
def q_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: predicate filters, pushed to the parquet scan by Catalyst."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_returnflag") == "R")
        )
        .groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "coalesce_partitions",
    """
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1
    """,
)
def q_coalesce_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: coalesce (api-extract-job.py:66) — result-invariant."""
    return (
        _t(spark, sf_dir, "orders")
        .coalesce(1)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# =====================================================================
# Joins (J1/J2 + engine extras: inner/semi/anti)
# =====================================================================


@query(
    "left_join_project",
    """
    SELECT o_orderkey, c_name
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
)
def q_left_join_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 raw shape: fact LEFT JOIN dim, broadcast the dim."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer),
        orders.o_custkey == customer.c_custkey,
        "left",
    ).select("o_orderkey", "c_name")


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "inner_join_agg",
    """
    SELECT n_name AS nation,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def q_inner_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supplier.join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("s_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_bal")
        )
    )


# =====================================================================
# Aggregations / quality aggregates (A4–A8)
# =====================================================================


@query(
    "uniqueness_ratio",
    """
    SELECT CAST(COUNT(DISTINCT c_custkey) AS DOUBLE)
           / CAST(COUNT(c_custkey) AS DOUBLE) AS uniqueness_ratio
    FROM customer
    """,
)
def q_uniqueness_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: DQDL Uniqueness ratio (glue.tf:21)."""
    return _t(spark, sf_dir, "customer").agg(
        (
            F.count_distinct("c_custkey").cast("double")
            / F.count("c_custkey").cast("double")
        ).alias("uniqueness_ratio")
    )


@query(
    "completeness",
    """
    SELECT CAST(COUNT(*) - COUNT(c_name) AS BIGINT) AS c_name_nulls,
           CAST(COUNT(*) - COUNT(c_acctbal) AS BIGINT) AS c_acctbal_nulls,
           CAST(COUNT(*) AS BIGINT) AS total
    FROM customer
    """,
)
def q_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: DQDL IsComplete as one aggregate pass."""
    return _t(spark, sf_dir, "customer").agg(
        (F.count(F.lit(1)) - F.count("c_name")).alias("c_name_nulls"),
        (F.count(F.lit(1)) - F.count("c_acctbal")).alias("c_acctbal_nulls"),
        F.count(F.lit(1)).alias("total"),
    )


@query(
    "column_length",
    """
    SELECT CAST(MIN(length(p_brand)) AS BIGINT) AS min_len,
           CAST(MAX(length(p_brand)) AS BIGINT) AS max_len,
           CAST(COUNT(CASE WHEN length(p_brand) <> 8 THEN 1 END) AS BIGINT)
               AS bad_count
    FROM part
    """,
)
def q_column_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/F8: DQDL ColumnLength = N (glue.tf:3,12)."""
    ln = F.length("p_brand")
    return _t(spark, sf_dir, "part").agg(
        F.min(ln).cast("bigint").alias("min_len"),
        F.max(ln).cast("bigint").alias("max_len"),
        F.count(F.when(ln != 8, 1)).alias("bad_count"),
    )


@query(
    "column_values_bound",
    """
    SELECT CAST(COUNT(CASE WHEN NOT (l_discount <= 0.08) THEN 1 END) AS BIGINT)
               AS violations,
           CAST(MAX(l_discount) AS DOUBLE) AS max_discount
    FROM lineitem
    """,
)
def q_column_values_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: DQDL ColumnValues "price" <= bound (glue.tf:12)."""
    d = F.col("l_discount")
    return _t(spark, sf_dir, "lineitem").agg(
        F.count(F.when(~(d <= 0.08), 1)).alias("violations"),
        F.max(d).cast("double").alias("max_discount"),
    )


@query(
    "unique_not_null",
    """
    SELECT CAST((SELECT COUNT(*) FROM (
               SELECT l_orderkey FROM lineitem
               GROUP BY l_orderkey HAVING COUNT(*) > 1)) AS BIGINT)
               AS duplicate_keys,
           CAST((SELECT COUNT(*) - COUNT(l_orderkey) FROM lineitem) AS BIGINT)
               AS null_keys
    """,
)
def q_unique_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: dbt unique + not_null data tests
    (serving_layer/schema.yml:8-12)."""
    li = _t(spark, sf_dir, "lineitem")
    dupes = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.count(F.lit(1)).alias("duplicate_keys"))
    )
    nulls = li.agg(
        (F.count(F.lit(1)) - F.count("l_orderkey")).alias("null_keys")
    )
    return dupes.crossJoin(nulls)


# =====================================================================
# Scalar functions (F1/F2/F4/F5/F6 + JSON path)
# =====================================================================


@query(
    "date_parts",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2: date_part('year'/'month') (sales_per_*_vw.sql)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "timestamp_roundtrip",
    """
    SELECT o_orderkey,
           CAST(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP)
               AS parsed_ts
    FROM orders
    """,
)
def q_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: ISO string → timestamp via built-in to_timestamp (replacing
    the reference's Python UDF, transform-json-job.py:61-64)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_timestamp(
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
        ).alias("parsed_ts"),
    )


@query(
    "explode_array",
    """
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings WHERE vec_id < 100
    """,
)
def q_explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: explode/posexplode (session_items unnest,
    transform-json-job.py:114)."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.col("val").cast("double").alias("val"))


@query(
    "struct_access",
    """
    SELECT o_orderkey AS orderkey, o_totalprice AS price
    FROM orders
    """,
)
def q_struct_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: struct build + field access (session_item.X,
    transform-json-job.py:118-125). The oracle is the algebraic
    identity (struct(x).x == x)."""
    o = _t(spark, sf_dir, "orders")
    packed = o.select(
        F.struct(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("price"),
        ).alias("item")
    )
    return packed.select(
        F.col("item.orderkey").alias("orderkey"),
        F.col("item.price").alias("price"),
    )


@query(
    "json_path",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def q_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction on the events props column (engine extra —
    the reference parses JSON structurally at read time, S2/S4)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


# =====================================================================
# Sources/sinks exercised end-to-end (S4/S5 + K1/K2/K5)
# =====================================================================


@query(
    "json_roundtrip",
    """
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders GROUP BY 1
    """,
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+K1: landing JSON write (overwrite, partition path) then
    directory scan with schema inference (api-extract-job.py:66-72 →
    transform-json-job.py:70-75)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    base = tempfile.mkdtemp(prefix="deftunes_landing_json_")
    path = write_landing_json(o, base, "2020-03-01", num_files=4)
    back = read_json_landing(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
    )


@query(
    "csv_roundtrip",
    """
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_price
    FROM orders GROUP BY 1
    """,
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+K2: CSV landing write + all-string read + explicit casts
    (extract-songs-job.py:40-50 → transform-songs-job.py:62-91)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="deftunes_landing_csv_")
    path = write_landing_csv(o, base, "2020-03-01", num_files=4)
    back = read_csv_landing(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_price")
    )


@query(
    "partitioned_append_idempotent",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT strftime(o_orderdate, '%Y')) AS BIGINT)
               AS n_partitions
    FROM orders
    """,
)
def q_partitioned_append_idempotent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """K3/K4/K5: partitioned create, then an idempotent re-write of the
    same partitions under dynamic partitionOverwriteMode — row count
    must equal a single copy (transform-json-job.py:57,147-187)."""
    _utc(spark)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        o = _t(spark, sf_dir, "orders").withColumn(
            "order_year", F.date_format("o_orderdate", "yyyy")
        )
        base = tempfile.mkdtemp(prefix="deftunes_table_") + "/orders_part"
        o.write.mode("overwrite").partitionBy("order_year").parquet(base)
        # Re-run of the same window: dynamic overwrite of the arriving
        # partitions only — idempotent, no duplication.
        o.write.mode("overwrite").partitionBy("order_year").parquet(base)
        back = spark.read.parquet(base)
        return back.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("order_year").cast("bigint").alias(
                "n_partitions"
            ),
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


# =====================================================================
# Engine extras that come free with Spark (§2.6): window / sort-limit /
# set ops
# =====================================================================


@query(
    "window_topk",
    """
    WITH agg AS (
        SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
        FROM lineitem
        GROUP BY 1, 2
    )
    SELECT ship_year, l_partkey, CAST(rev AS DOUBLE) AS revenue,
           CAST(rk AS INTEGER) AS rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY ship_year
                   ORDER BY rev DESC, l_partkey) AS rk
        FROM agg
    ) WHERE rk <= 3
    """,
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via window rank (extension suite, SURVEY §2.6).
    Ties broken by partkey so the result is deterministic."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy(
        F.year("l_shipdate").cast("bigint").alias("ship_year"),
        "l_partkey",
    ).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("_rev")
    )
    w = (
        Window.partitionBy("ship_year")
        .orderBy(F.col("_rev").desc(), F.col("l_partkey"))
    )
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "ship_year",
            "l_partkey",
            F.col("_rev").cast("double").alias("revenue"),
            "rk",
        )
    )


@query(
    "order_limit",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (TakeOrderedAndProject — no full sort at
    scale). Deterministic tie-break on the key."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "set_ops",
    """
    SELECT 'union' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect', nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except', nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT SELECT s_nationkey FROM supplier)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supplier = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    u = customer.union(supplier).distinct().withColumn("op", F.lit("union"))
    i = customer.intersect(supplier).withColumn("op", F.lit("intersect"))
    x = customer.subtract(supplier).withColumn("op", F.lit("except"))
    return u.unionByName(i).unionByName(x).select("op", "nationkey")


# =====================================================================
# DQ rulesets evaluated through the quality engine
# =====================================================================

_RULE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("rule_name", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("metric", T.DoubleType(), False),
    ]
)


def _ruleset_query(df: DataFrame, rules: list[Rule]) -> DataFrame:
    spark = df.sparkSession
    results = evaluate_ruleset(df, rules)
    rows = [(r.rule_name, r.passed, float(r.metric)) for r in results]
    return spark.createDataFrame(rows, _RULE_RESULT_SCHEMA)


def _oracle_rule_rows(table_expr: str, rules: list[Rule]) -> str:
    """Build the UNION ALL oracle mirroring evaluate_ruleset verdicts."""
    parts: list[str] = []
    for r in rules:
        kind = type(r).__name__
        c = getattr(r, "column", None)
        if kind in ("IsComplete", "NotNull"):
            metric = f"CAST(COUNT(*) - COUNT({c}) AS DOUBLE)"
            passed = f"(COUNT(*) - COUNT({c})) = 0"
        elif kind == "ColumnLength":
            bad = (
                f"COUNT(CASE WHEN length({c}) <> {r.length} "
                f"AND {c} IS NOT NULL THEN 1 END)"
            )
            metric = f"CAST({bad} AS DOUBLE)"
            passed = f"{bad} = 0"
        elif kind == "Uniqueness":
            metric = (
                f"CASE WHEN COUNT({c}) = 0 THEN 1.0 ELSE "
                f"CAST(COUNT(DISTINCT {c}) AS DOUBLE) / "
                f"CAST(COUNT({c}) AS DOUBLE) END"
            )
            passed = f"({metric}) > {r.threshold}"
        elif kind == "ColumnValues":
            bad = (
                f"COUNT(CASE WHEN NOT ({c} {r.op} {r.bound}) THEN 1 END)"
            )
            metric = f"CAST({bad} AS DOUBLE)"
            passed = f"{bad} = 0"
        elif kind == "Unique":
            bad = f"(COUNT({c}) - COUNT(DISTINCT {c}))"
            metric = f"CAST({bad} AS DOUBLE)"
            passed = f"{bad} = 0"
        elif kind == "RowCount":
            metric = "CAST(COUNT(*) AS DOUBLE)"
            passed = f"COUNT(*) {r.op} {r.threshold}"
        elif kind == "MeanBetween":
            mean = (
                f"(CAST(SUM(CAST({c} AS DECIMAL(28,6))) AS DOUBLE)"
                f" / COUNT({c}))"
            )
            metric = mean
            passed = f"{mean} BETWEEN {r.lo} AND {r.hi}"
        elif kind == "CustomSql":
            metric = f"CAST(({r.agg_sql}) AS DOUBLE)"
            passed = f"CAST(({r.agg_sql}) AS DOUBLE) {r.op} {r.threshold}"
        else:  # pragma: no cover
            raise ValueError(f"no oracle template for rule {kind}")
        parts.append(
            f"SELECT '{r.name.replace(chr(39), chr(39) * 2)}' AS rule_name, "
            f"{passed} AS passed, {metric} AS metric FROM {table_expr}"
        )
    return "\nUNION ALL\n".join(parts)


def _customer_rules() -> list[Rule]:
    from deftunes_spark.quality.rules import (
        ColumnLength,
        ColumnValues,
        IsComplete,
        Uniqueness,
        Unique,
    )

    return [
        IsComplete("c_name"),
        Uniqueness("c_custkey", 0.95),
        ColumnLength("c_mktsegment", 8),
        ColumnValues("c_acctbal", 5000.0, op="<="),
        Unique("c_custkey"),
    ]


@query("dq_customer_ruleset")
def q_dq_customer_ruleset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: DQDL-style ruleset evaluated in ONE aggregate pass by the
    quality engine; per-rule PASS/FAIL rows (glue.tf shape)."""
    return _ruleset_query(_t(spark, sf_dir, "customer"), _customer_rules())


ORACLES["dq_customer_ruleset"] = _oracle_rule_rows(
    "customer", _customer_rules()
)
