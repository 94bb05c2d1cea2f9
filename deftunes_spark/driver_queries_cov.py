"""Driver queries closing the remaining SURVEY §2 coverage rows:

- S1/S2  REST window fetch → JSON literal ingest (rest_ingest)
- S3     JDBC table scan (embedded Derby — a real JDBC round trip)
- S6/S7  catalog scan + introspection
- K6/K7  model registry TABLE/VIEW materialization (dbt analog)
- O1–O6  pipeline runner backfill with DQ gate
- §2.10  the three verbatim DQDL rulesets evaluated on DeFtunes-shaped
         derivations of the shared testdata (ids/uuids/prices derived
         with SQL that both engines evaluate identically, violations
         seeded deterministically)
"""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deftunes_spark.driver_queries import (
    ORACLES,
    _oracle_rule_rows,
    _ruleset_query,
    _t,
    _utc,
    query,
)
from deftunes_spark.io.readers import (
    fetch_rest_window,
    read_json_landing,
    table_exists,
)
from deftunes_spark.io.writers import write_landing_json
from deftunes_spark.models.registry import Model, ModelRegistry
from deftunes_spark.pipeline.runner import Pipeline, PipelineTask
from deftunes_spark.quality.evaluator import evaluate_ruleset
from deftunes_spark.quality.rulesets import REFERENCE_RULESETS
from deftunes_spark.transforms.deftunes import users_flatten

# =====================================================================
# S1/S2: REST ingest chain (deterministic offline fetcher)
# =====================================================================

_REST_USERS = [
    {
        "user_id": f"{i:032x}"[:8]
        + "-"
        + f"{i:032x}"[8:12]
        + "-"
        + f"{i:032x}"[12:16]
        + "-"
        + f"{i:032x}"[16:20]
        + "-"
        + f"{i:032x}"[20:32],
        "user_name": f"user{i}",
        "user_location": [
            f"{40 + i % 5}.5",
            f"-{70 + i % 5}.25",
            f"City{i % 3}",
            ["US", "DE", "FR"][i % 3],
            "UTC",
        ],
    }
    for i in range(24)
]


def _rest_oracle() -> str:
    rows = []
    for u in _REST_USERS:
        loc = u["user_location"]
        rows.append(
            f"('{u['user_id']}', '{u['user_name']}', '{loc[0]}', "
            f"'{loc[3]}')"
        )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") t(user_id, user_name, latitude, country_code)"
    )


@query("rest_ingest", _rest_oracle())
def q_rest_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S2+K1+S4+P5: REST window fetch (api-extract-job.py:34-72
    contract, injected offline fetcher) → landing JSON overwrite →
    directory scan → positional user_location flatten."""
    _utc(spark)
    raw = fetch_rest_window(
        spark,
        "http://offline/users",
        "2020-02-01",
        "2020-02-29",
        fetcher=lambda url: json.loads(json.dumps(_REST_USERS)),
    )
    base = tempfile.mkdtemp(prefix="deftunes_rest_")
    path = write_landing_json(raw, base, "2020-03-01")
    landed = read_json_landing(spark, path)
    flat = users_flatten(landed)
    return flat.select("user_id", "user_name", "latitude", "country_code")


# =====================================================================
# S3: JDBC scan via embedded Derby
# =====================================================================

_JDBC_SONGS = [
    (f"SO{i:016d}", f"Title {i}", f"Artist {i % 3}", 100.5 + i, 1990 + i)
    for i in range(12)
]


def _jdbc_oracle() -> str:
    rows = ", ".join(
        f"('{s}', '{t}', '{a}', {d}, {y})"
        for s, t, a, d, y in _JDBC_SONGS
    )
    return (
        f"SELECT song_id, title, artist_name, "
        f"CAST(duration AS DOUBLE) AS duration, "
        f"CAST(year AS INTEGER) AS year FROM (VALUES {rows}) "
        "t(song_id, title, artist_name, duration, year)"
    )


@query("jdbc_scan", _jdbc_oracle())
def q_jdbc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: real JDBC round trip (extract-songs-job.py:30-38 semantics)
    against an embedded Derby database — exercising Spark's actual
    JDBC source, not a stub. At scale, readers.read_jdbc_table adds
    partitioned range scans."""
    _utc(spark)
    db = tempfile.mkdtemp(prefix="deftunes_derby_") + "/db"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:derby:{db};create=true"
    )
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE songs (song_id VARCHAR(18), title VARCHAR(64), "
        "artist_name VARCHAR(64), duration DOUBLE, year_ INT)"
    )
    ps = conn.prepareStatement("INSERT INTO songs VALUES (?, ?, ?, ?, ?)")
    for song_id, title, artist, duration, year in _JDBC_SONGS:
        ps.setString(1, song_id)
        ps.setString(2, title)
        ps.setString(3, artist)
        ps.setDouble(4, duration)
        ps.setInt(5, year)
        ps.executeUpdate()
    conn.close()
    df = (
        spark.read.format("jdbc")
        .option("url", f"jdbc:derby:{db}")
        .option("dbtable", "songs")
        .load()
    )
    return df.select(
        F.col("SONG_ID").alias("song_id"),
        F.col("TITLE").alias("title"),
        F.col("ARTIST_NAME").alias("artist_name"),
        F.col("DURATION").alias("duration"),
        F.col("YEAR_").cast("int").alias("year"),
    )


# =====================================================================
# S6/S7: catalog scan + introspection
# =====================================================================


@query(
    "catalog_introspection",
    """
    SELECT 'deftunes_cat_customer' AS table_name, TRUE AS exist,
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'deftunes_cat_missing', FALSE, CAST(NULL AS BIGINT)
    """,
)
def q_catalog_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6+S7: register → listTables/tableExists branch → spark.table
    scan (transform-json-job.py:147-151 append-vs-create probe)."""
    customer = _t(spark, sf_dir, "customer")
    customer.createOrReplaceTempView("deftunes_cat_customer")
    rows = []
    for name in ("deftunes_cat_customer", "deftunes_cat_missing"):
        exist = table_exists(spark, name)
        n = spark.table(name).count() if exist else None
        rows.append((name, exist, n))
    return spark.createDataFrame(
        rows, "table_name string, exist boolean, n_rows bigint"
    )


# =====================================================================
# K6/K7 + E3: model registry (dbt analog) build
# =====================================================================


@query(
    "model_registry_build",
    """
    WITH fact_orders AS (
        SELECT o_custkey AS user_id, o_totalprice AS price,
               o_orderdate AS session_start_time
        FROM orders
    ), dim_customers AS (
        SELECT c_custkey AS user_id, c_mktsegment AS segment
        FROM customer
    )
    SELECT CAST(year(session_start_time) AS BIGINT) AS session_year,
           segment,
           CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS total_sales
    FROM fact_orders LEFT JOIN dim_customers USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_model_registry_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6/K7: dbt-style model registry — SQL models with {var}
    templating and refs, topologically materialized as views, BI view
    consumed from the catalog (dbt_project.yml:25-42 semantics)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("src_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("src_customer")
    reg = ModelRegistry(variables={"source": "src"})
    reg.add(
        Model(
            name="fact_orders",
            sql=(
                "SELECT o_custkey AS user_id, o_totalprice AS price, "
                "o_orderdate AS session_start_time FROM {source}_orders"
            ),
            columns=("user_id", "price", "session_start_time"),
        )
    )
    reg.add(
        Model(
            name="dim_customers",
            sql=(
                "SELECT c_custkey AS user_id, c_mktsegment AS segment "
                "FROM {source}_customer"
            ),
            columns=("user_id", "segment"),
        )
    )
    reg.add(
        Model(
            name="bi_sales_per_segment",
            sql=(
                "SELECT CAST(year(session_start_time) AS BIGINT) AS "
                "session_year, segment, CAST(SUM(CAST(price AS "
                "DECIMAL(18,4))) AS DOUBLE) AS total_sales "
                "FROM fact_orders LEFT JOIN dim_customers USING (user_id) "
                "GROUP BY 1, 2"
            ),
            refs=("fact_orders", "dim_customers"),
            materialized="view",
            columns=("session_year", "segment", "total_sales"),
        )
    )
    reg.run(spark)
    return spark.table("bi_sales_per_segment")


@query(
    "model_versioned_rebuild",
    """
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
    FROM customer
    GROUP BY 1
    """,
)
def q_model_versioned_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 + Iceberg-guarantee end-to-end: a model materialized as
    ``versioned_table`` through the registry, rebuilt with a changed
    variable (second run doubles the balances — a deliberately wrong
    rebuild), then time-traveled back to version 0 VIA the registry
    (``read_model_version``). The oracle recomputes the v0 content
    from source, so a rebuild leaking into the old snapshot fails the
    value hash — the snapshot-isolation guarantee itself is what's
    checked."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView(
        "src_vt_customer"
    )
    base = tempfile.mkdtemp(prefix="deftunes_vt_model_")

    def build(mult: str) -> ModelRegistry:
        reg = ModelRegistry(
            variables={"mult": mult}, versioned_base_path=base
        )
        reg.add(
            Model(
                name="seg_balance",
                sql=(
                    "SELECT c_mktsegment AS segment, "
                    "CAST(COUNT(*) AS BIGINT) AS n_customers, "
                    "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) * {mult} "
                    "AS DOUBLE) AS bal "
                    "FROM src_vt_customer GROUP BY 1"
                ),
                materialized="versioned_table",
                columns=("segment", "n_customers", "bal"),
            )
        )
        return reg

    build("1").run(spark)  # version 0 — the truth
    reg = build("2")
    reg.run(spark)  # version 1 — doubled balances
    return reg.read_model_version(spark, "seg_balance", version=0)


# =====================================================================
# O1–O6: pipeline backfill with DQ gate
# =====================================================================


@query(
    "pipeline_backfill",
    """
    SELECT '2024-02-01' AS ingest_on, CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
    """,
)
def q_pipeline_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1–O6: monthly-window backfill through the DAG runner —
    extract (window filter) → transform (lineage) → DQ gate → load
    (dynamic-partition overwrite), run twice to prove idempotent
    re-runs (deftunes_api_pipeline.py:182-189 semantics)."""
    _utc(spark)
    from deftunes_spark.quality.rules import IsComplete
    from deftunes_spark.quality.evaluator import quality_gate

    events = _t(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="deftunes_pipe_") + "/events_silver"
    state: dict[str, DataFrame] = {}

    def extract(ctx):
        state["batch"] = events.filter(
            (F.col("ts") >= F.lit(ctx["window_start"]).cast("timestamp"))
            & (F.col("ts") < F.lit(ctx["ingest_date"]).cast("timestamp"))
        )

    def transform(ctx):
        state["silver"] = state["batch"].withColumn(
            "ingest_on", F.lit(ctx["ingest_date"])
        )

    def dq_gate(ctx):
        quality_gate(state["silver"], [IsComplete("event_id")])

    def load(ctx):
        (
            state["silver"]
            .write.mode("overwrite")
            .partitionBy("ingest_on")
            .parquet(base)
        )

    p = Pipeline("events_backfill")
    p.add(PipelineTask("extract", extract))
    p.add(PipelineTask("transform", transform, depends_on=("extract",)))
    p.add(
        PipelineTask(
            "dq", dq_gate, depends_on=("transform",), is_gate=True
        )
    )
    p.add(PipelineTask("load", load, depends_on=("dq",)))

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        p.backfill("2024-01-01", "2024-01-31")
        p.backfill("2024-01-01", "2024-01-31")  # idempotent re-run
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.parquet(base)
    # Partition-column inference types the dir value as DATE; align to
    # the string the oracle produces.
    return back.groupBy(
        F.col("ingest_on").cast("string").alias("ingest_on")
    ).agg(F.count(F.lit(1)).alias("n"))


# =====================================================================
# §2.10: verbatim reference rulesets on DeFtunes-shaped derivations
# =====================================================================

# SQL snippets evaluated identically by Spark SQL and DuckDB; {str} is
# the dialect's string type name. Violations are seeded by modulus so
# both engines derive the exact same table.
_SONGS_DERIVE = {
    "track_id": (
        "CASE WHEN p_partkey % 97 = 0 THEN 'TRSHORT' ELSE "
        "concat('TR', substr(md5(cast(p_partkey AS {str})), 1, 16)) END"
    ),
    "song_id": (
        "CASE WHEN p_partkey % 89 = 0 THEN NULL ELSE "
        "concat('SO', substr(md5(cast(p_partkey + 7 AS {str})), 1, 16)) END"
    ),
    "artist_id": (
        "CASE WHEN p_partkey % 83 = 0 THEN NULL ELSE "
        "concat('AR', substr(md5(cast(p_partkey % 50 AS {str})), 1, 16)) END"
    ),
}

_UUID36 = (
    "concat(substr(md5(cast({expr} AS {str})), 1, 8), '-', "
    "substr(md5(cast({expr} AS {str})), 9, 4), '-', "
    "substr(md5(cast({expr} AS {str})), 13, 4), '-', "
    "substr(md5(cast({expr} AS {str})), 17, 4), '-', "
    "substr(md5(cast({expr} AS {str})), 21, 12))"
)

_SESSIONS_DERIVE = {
    "user_id": _UUID36.replace("{expr}", "l_orderkey"),
    "session_id": _UUID36.replace(
        "{expr}", "l_orderkey * 10 + l_linenumber"
    ),
    "song_id": "concat('SO', substr(md5(cast(l_partkey AS {str})), 1, 16))",
    "price": (
        "CASE WHEN l_orderkey % 211 = 0 THEN 5.0 "
        "ELSE l_discount * 10.0 END"
    ),
}

_USERS_DERIVE = {
    "user_id": _UUID36.replace("{expr}", "c_custkey % 1400"),
    "user_lastname": (
        "CASE WHEN c_custkey % 53 = 0 THEN NULL ELSE c_name END"
    ),
    "user_name": "c_name",
    "user_since": "'2019-01-01'",
}


def _derive(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    return df.selectExpr(
        *[
            f"{expr.format(str='STRING')} AS {name}"
            for name, expr in mapping.items()
        ]
    )


def _derive_oracle(src: str, mapping: dict[str, str]) -> str:
    cols = ", ".join(
        f"{expr.format(str='VARCHAR')} AS {name}"
        for name, expr in mapping.items()
    )
    return f"(SELECT {cols} FROM {src})"


@query("dq_songs_ruleset")
def q_dq_songs_ruleset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim songs DQDL ruleset (glue.tf:3) on a part-derived songs
    table with seeded length/NULL violations — ONE aggregate pass."""
    derived = _derive(_t(spark, sf_dir, "part"), _SONGS_DERIVE)
    return _ruleset_query(derived, REFERENCE_RULESETS["songs"])


ORACLES["dq_songs_ruleset"] = _oracle_rule_rows(
    _derive_oracle("part", _SONGS_DERIVE) + " s",
    REFERENCE_RULESETS["songs"],
)


@query("dq_sessions_ruleset")
def q_dq_sessions_ruleset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim sessions ruleset (glue.tf:12) on a lineitem-derived
    sessions table (uuid ids, seeded price>2 violations)."""
    derived = _derive(_t(spark, sf_dir, "lineitem"), _SESSIONS_DERIVE)
    return _ruleset_query(derived, REFERENCE_RULESETS["sessions"])


ORACLES["dq_sessions_ruleset"] = _oracle_rule_rows(
    _derive_oracle("lineitem", _SESSIONS_DERIVE) + " s",
    REFERENCE_RULESETS["sessions"],
)


@query("dq_users_ruleset")
def q_dq_users_ruleset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim users ruleset (glue.tf:21) on a customer-derived users
    table (modulo-collapsed user_id exercises the Uniqueness > 0.95
    boundary)."""
    derived = _derive(_t(spark, sf_dir, "customer"), _USERS_DERIVE)
    return _ruleset_query(derived, REFERENCE_RULESETS["users"])


ORACLES["dq_users_ruleset"] = _oracle_rule_rows(
    _derive_oracle("customer", _USERS_DERIVE) + " s",
    REFERENCE_RULESETS["users"],
)


# =====================================================================
# Extended DQDL grammar: RowCount / Mean / CustomSql
# =====================================================================


def _extended_rules():
    from deftunes_spark.quality.rules import (
        CustomSql,
        MeanBetween,
        RowCount,
    )

    return [
        RowCount(1000, op=">"),
        MeanBetween("l_quantity", 20.0, 30.0),
        CustomSql(
            "returnflag_domain",
            "count(distinct l_returnflag)",
            3.0,
            op="=",
        ),
        CustomSql(
            "discount_domain",
            "count(case when l_discount < 0 or l_discount > 1 then 1 end)",
            0.0,
            op="=",
        ),
    ]


@query("dq_extended_ruleset")
def q_dq_extended_ruleset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended DQDL grammar (RowCount volume guard, Mean drift guard,
    CustomSql escape hatch) — still ONE aggregation pass for the whole
    ruleset."""
    from deftunes_spark.driver_queries import _ruleset_query, _t

    return _ruleset_query(
        _t(spark, sf_dir, "lineitem"), _extended_rules()
    )


ORACLES["dq_extended_ruleset"] = _oracle_rule_rows(
    "lineitem", _extended_rules()
)


# =====================================================================
# r2: schema evolution + column contracts, driver-visible
# =====================================================================


@query(
    "schema_evolution_append",
    """
    SELECT 'b1' AS batch, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(0 AS BIGINT) AS n_scored,
           CAST(NULL AS DOUBLE) AS score_sum
    FROM nation
    UNION ALL
    SELECT 'b2', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_nationkey) * 0.5 AS DOUBLE)
    FROM nation
    """,
)
def q_schema_evolution_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a catalog table (the reference's Iceberg
    format-v2 motivation, transform-json-job.py:156-187): batch b1
    lands without ``score``, batch b2 arrives WITH it —
    ``write_table_append_evolve`` adds the column via ALTER TABLE
    (metadata-only), b1's files read back as NULL. The oracle pins the
    union-schema semantics: per batch, row count, non-null score count,
    and the score sum."""
    from deftunes_spark.io.writers import write_table_append_evolve

    _utc(spark)
    t = "evolve_nation_r2"
    # Idempotent re-runs ACROSS sessions: the default in-memory catalog
    # forgets the table between processes but its warehouse directory
    # persists, so DROP alone can't clear the location.
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    import shutil

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    nation = _t(spark, sf_dir, "nation")
    b1 = nation.select(
        "n_nationkey", "n_name", F.lit("b1").alias("batch")
    )
    b2 = nation.select(
        "n_nationkey",
        "n_name",
        (F.col("n_nationkey") * 0.5).alias("score"),
        F.lit("b2").alias("batch"),
    )
    write_table_append_evolve(spark, b1, t, partition_col="batch")
    write_table_append_evolve(spark, b2, t, partition_col="batch")
    return (
        spark.table(t)
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count("score").cast("bigint").alias("n_scored"),
            F.sum("score").cast("double").alias("score_sum"),
        )
    )


@query(
    "model_contract_status",
    """
    SELECT 'dim_nations' AS model, 'ok' AS contract
    UNION ALL
    SELECT 'renamed_nations', 'violated'
    """,
)
def q_model_contract_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative column contracts (dbt serving_layer/schema.yml:5-51):
    a conforming model builds, a model whose output drifted from its
    declared columns fails with ContractViolation — the dbt-contract
    gate, surfaced as a status row per model."""
    from deftunes_spark.models.registry import ContractViolation

    _utc(spark)
    _t(spark, sf_dir, "nation").createOrReplaceTempView("src_nation_r2")
    reg = ModelRegistry()
    reg.add(
        Model(
            name="dim_nations",
            sql=(
                "SELECT n_nationkey AS nation_id, n_name AS nation "
                "FROM src_nation_r2"
            ),
            columns=("nation_id", "nation"),
        )
    )
    reg.add(
        Model(
            name="renamed_nations",
            sql=(
                "SELECT n_nationkey AS nation_id, n_name AS nation_name "
                "FROM src_nation_r2"
            ),
            columns=("nation_id", "nation"),  # declared ≠ built
        )
    )
    rows = []
    for name in ("dim_nations", "renamed_nations"):
        try:
            reg.build_df(spark, name)
            rows.append((name, "ok"))
        except ContractViolation:
            rows.append((name, "violated"))
    return spark.createDataFrame(rows, "model string, contract string")


# =====================================================================
# ORC format roundtrip + small-file compaction (table maintenance)
# =====================================================================

_ORC_ORACLE = """
SELECT s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
FROM supplier GROUP BY 1
"""


@query("orc_roundtrip", _ORC_ORACLE)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write + read-back (the second columnar format Spark ships
    a vectorized reader for — same predicate-pushdown / column-pruning
    behavior as parquet, relevant when an upstream warehouse lands
    ORC). Aggregate after the roundtrip so the oracle checks content,
    not just schema."""
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    path = tempfile.mkdtemp(prefix="deftunes_orc_") + "/supplier"
    s.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("s_acctbal").cast("decimal(18,4)"))
        .cast("double")
        .alias("bal"),
    )


_COMPACT_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       CAST(SUM(length(text)) AS BIGINT) AS char_sum
FROM documents
"""


_TIME_TRAVEL_ORACLE = """
SELECT n_regionkey,
       CAST(COUNT(*) AS BIGINT) AS n_nations
FROM nation
GROUP BY 1
"""


@query("versioned_time_travel", _TIME_TRAVEL_ORACLE)
def q_versioned_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel on a versioned parquet table (io/versioned.py —
    the Iceberg-v2 snapshot-read guarantee rebuilt on plain parquet:
    immutable _v{N} data dirs + atomic put-if-absent manifest rename;
    reference boundary: transform-json-job.py:156-187 Iceberg conf).

    Version 0 = per-region nation counts; version 1 OVERWRITES with a
    deliberately wrong projection (counts doubled). Reading
    ``version=0`` after the overwrite must return the original result
    — which is exactly what the oracle recomputes from the source.
    """
    from deftunes_spark.io.versioned import read_version, write_versioned

    nation = _t(spark, sf_dir, "nation")
    v0 = nation.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations")
    )
    path = tempfile.mkdtemp(prefix="deftunes_ttv_") + "/t"
    write_versioned(spark, v0, path, mode="overwrite")
    write_versioned(
        spark,
        v0.withColumn("n_nations", F.col("n_nations") * 2),
        path,
        mode="overwrite",
    )
    return read_version(spark, path, version=0)


@query("compact_roundtrip", _COMPACT_ORACLE)
def q_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: land documents as 32 deliberately tiny
    files (the micro-batch-ingest accretion pattern), compact to
    measured-size targets, and prove bit-level content preservation
    through the rewrite via count/sum/char-sum. File-count mechanics
    are asserted in tests/test_layout.py; here the oracle checks the
    invariant that matters — compaction must never change the data."""
    from deftunes_spark.ext.layout import compact_path

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    path = tempfile.mkdtemp(prefix="deftunes_compact_") + "/docs"
    docs.repartition(32).write.mode("overwrite").parquet(path)
    compact_path(spark, path, target_file_bytes=64 * 1024 * 1024)
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("id_sum"),
        F.sum(F.length("text")).alias("char_sum"),
    )


_COMPACT_VERSIONED_ORACLE = """
SELECT 3 AS new_version, 2 AS base_version,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       TRUE AS files_reduced
FROM documents
"""


@query("compact_versioned_roundtrip", _COMPACT_VERSIONED_ORACLE)
def q_compact_versioned_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Versioned-table maintenance end-to-end: three incremental
    appends accrete three data dirs; compact_versioned folds them into
    one right-sized dir committed as version 3 under the conditional
    base-snapshot assertion. The oracle pins the version arithmetic,
    content preservation (count/id-sum over the full corpus), and that
    compaction actually reduced the file count; conflict/expiry
    mechanics are pytest-asserted (tests/test_versioned.py)."""
    import tempfile as _tf

    from deftunes_spark.io.versioned import (
        compact_versioned,
        read_version,
        write_versioned,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    path = _tf.mkdtemp(prefix="deftunes_vcompact_") + "/tbl"
    for i in range(3):
        write_versioned(
            spark,
            docs.filter(F.col("doc_id") % 3 == i).repartition(8),
            path,
            mode="overwrite" if i == 0 else "append",
        )
    stats = compact_versioned(spark, path, target_file_bytes=10**9)
    back = read_version(spark, path)
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
    ).select(
        F.lit(stats["new_version"]).cast("int").alias("new_version"),
        F.lit(stats["base_version"]).cast("int").alias("base_version"),
        "n_rows",
        "id_sum",
        F.lit(
            stats["files_after"] < stats["files_before"]
        ).alias("files_reduced"),
    )


_PRUNED_SCAN_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       TRUE AS files_pruned
FROM orders
WHERE o_orderkey BETWEEN 2000 AND 3999
"""


@query("versioned_pruned_scan", _PRUNED_SCAN_ORACLE)
def q_versioned_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level data skipping end-to-end: orders land in three
    key-range appends with per-file min/max stats recorded in each
    manifest (stats_cols); a pruned read for the middle range scans
    only intersecting files — Iceberg's file-pruning contract (a
    SUPERSET, so the row filter still applies) — and the oracle checks
    content equality against a plain filter while files_pruned pins
    that skipping genuinely skipped."""
    import tempfile as _tf

    from deftunes_spark.io.versioned import (
        plan_pruned_files,
        read_version_pruned,
        write_versioned,
    )

    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    path = _tf.mkdtemp(prefix="deftunes_prune_") + "/tbl"
    bounds = [(0, 1999), (2000, 3999), (4000, 10**9)]
    for i, (lo, hi) in enumerate(bounds):
        write_versioned(
            spark,
            o.filter(F.col("o_orderkey").between(lo, hi)).repartition(4),
            path,
            mode="overwrite" if i == 0 else "append",
            stats_cols=["o_orderkey"],
        )
    files, total = plan_pruned_files(spark, path, "o_orderkey", 2000, 3999)
    out = (
        read_version_pruned(spark, path, "o_orderkey", 2000, 3999)
        .filter(F.col("o_orderkey").between(2000, 3999))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        )
    )
    return out.select(
        "n_rows", "key_sum",
        F.lit(len(files) < total).alias("files_pruned"),
    )


_DELETE_MOR_ORACLE = """
SELECT 1 AS delete_version,
       TRUE AS no_data_rewritten,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM orders
WHERE NOT COALESCE(o_totalprice > 200000, FALSE)
"""


@query("versioned_delete_mor", _DELETE_MOR_ORACLE)
def q_versioned_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE, merge-on-read: the predicate commits as pure
    metadata (the new manifest references the SAME data dirs — pinned
    by no_data_rewritten) and readers apply NOT coalesce(pred, false)
    at scan time, so NULL-evaluating rows survive exactly as SQL
    DELETE leaves them. O(metadata) commit regardless of table size —
    the GDPR-pass shape at 100 TB; compact_versioned later folds the
    predicates into a materialized snapshot (pytest-asserted)."""
    import tempfile as _tf

    from deftunes_spark.io.versioned import (
        _manifest_dirs,
        delete_where,
        list_versions,
        read_version,
        write_versioned,
    )

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = _tf.mkdtemp(prefix="deftunes_delmor_") + "/tbl"
    write_versioned(spark, o, path)
    v = delete_where(spark, path, "o_totalprice > 200000")
    ms = list_versions(spark, path)
    same_dirs = _manifest_dirs(ms[-1]) == _manifest_dirs(ms[0])
    return read_version(spark, path).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
    ).select(
        F.lit(v).cast("int").alias("delete_version"),
        F.lit(same_dirs).alias("no_data_rewritten"),
        "n_rows",
        "key_sum",
    )


_BUCKETED_JOIN_ORACLE = """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


# One bucketed table pair per (session, sf_dir): like the
# versioned-store queries, a bucketed-catalog-join demo inherently
# writes its tables before the lazy plan can reference them, but the
# write must happen ONCE — not per build (bench re-invokes builders) —
# and under names no concurrent harness process shares. uuid-suffixed
# EXTERNAL tables in a tempdir: no fixed-name race on the shared
# spark-warehouse, no warehouse accumulation across runs, and a second
# build with a different sf_dir gets its own pair instead of silently
# invalidating the first call's still-lazy DataFrame.
# Keyed by applicationId, not id(spark): a stopped session's address
# can be reused by a new one, silently aliasing it to the dead pair.
# Catalog lifetime: the engine runs Spark's default IN-MEMORY catalog
# (no Hive metastore), so the uuid-named table DEFINITIONS die with
# the process; only the tempdir parquet outlives it (OS-reclaimed).
_BKT_TABLES: dict[tuple[str, str], tuple[str, str]] = {}


def _bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    import tempfile as _tf
    import uuid as _uuid

    from deftunes_spark.io.writers import write_bucketed_table

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BKT_TABLES:
        suf = _uuid.uuid4().hex[:10]
        base = _tf.mkdtemp(prefix="deftunes_bktq_")
        ot, ct = f"bktq_orders_{suf}", f"bktq_customer_{suf}"
        o = _t(spark, sf_dir, "orders").select(
            "o_custkey", "o_totalprice"
        )
        c = _t(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        write_bucketed_table(
            o, ot, "o_custkey", 8, "o_custkey", path=f"{base}/{ot}"
        )
        write_bucketed_table(
            c, ct, "c_custkey", 8, "c_custkey", path=f"{base}/{ct}"
        )
        _BKT_TABLES[key] = (ot, ct)
    return _BKT_TABLES[key]


@query("bucketed_join_colocated", _BUCKETED_JOIN_ORACLE)
def q_bucketed_join_colocated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shuffle-free fact×dim join off bucketed catalog tables: orders
    and customer land bucketed (and sorted) on the join key, so the
    join and its downstream aggregate plan with the bucket layout
    instead of an Exchange on the fact side — the pay-the-shuffle-
    once-at-write 100 TB strategy for repeated joins on one key
    (io/writers.write_bucketed_table; plan asserted Exchange-free in
    tests/test_bucketing.py). The oracle recomputes the same join
    from the raw parquet — bucketing must never change results.
    Tables are written once per (session, sf_dir) under process-unique
    names (see _bucketed_pair) — the write is the operator under test,
    the same build-time-action exemption as the versioned-store
    queries."""
    ot, ct = _bucketed_pair(spark, sf_dir)
    ob = spark.table(ot)
    cb = spark.table(ct)
    return (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
        )
    )
