"""Driver queries: SCD Type-2 versioning and deterministic sampling.

Both families are cross-engine exact: SCD2 is pure window SQL, and the
sampling predicate is an md5-prefix threshold that any engine computes
identically (the whole point — reproducible corpus splits)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deftunes_spark.driver_queries import _t, query
from deftunes_spark.ext.sampling import (
    _BUCKETS,
    hash_sample,
    train_test_split,
)
from deftunes_spark.ext.scd import scd2_from_log

# =====================================================================
# SCD2: user activity-state history from the events log
# =====================================================================

from deftunes_spark.ext.scd import scd2_tie_dedup_cte

_SCD2_ORACLE = f"""
WITH dedup AS (
    {scd2_tie_dedup_cte()}
), ordered AS (
    SELECT user_id, ts, event_type,
           lag(event_type) OVER w AS prev_type,
           lag(ts) OVER w AS prev_ts
    FROM dedup WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), versions AS (
    SELECT user_id, ts, event_type FROM ordered
    WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_type
)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER wv AS valid_to,
       CAST(ROW_NUMBER() OVER wv AS BIGINT) AS version
FROM versions WINDOW wv AS (PARTITION BY user_id ORDER BY ts)
"""


@query("scd2_user_state", _SCD2_ORACLE)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 build: collapse each user's event-type log into
    versioned rows with [valid_from, valid_to) ranges — lag to detect
    changes, lead for the closing edge, one shuffle on the key."""
    from deftunes_spark.ext.scd import dedup_log_ties

    ev = dedup_log_ties(
        _t(spark, sf_dir, "events").select(
            "user_id", "ts", "event_type", "event_id"
        ),
        "user_id", "ts", "event_id",
    )
    return scd2_from_log(ev, "user_id", "ts", ["event_type"])


# =====================================================================
# Deterministic hash sampling / splits
# =====================================================================


def _hex_threshold(fraction: float) -> str:
    return format(int(fraction * _BUCKETS), "06x")


_SAMPLE_ORACLE = f"""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6)
      < '{_hex_threshold(0.1)}'
"""


@query("hash_sample_10pct", _SAMPLE_ORACLE)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample keyed on md5(o_orderkey): membership is
    a pure function of the row — stable across re-runs, partitioning,
    engines (the oracle replays the same predicate in DuckDB)."""
    o = _t(spark, sf_dir, "orders")
    return hash_sample(o, "o_orderkey", 0.1).select(
        "o_orderkey", "o_totalprice"
    )


_SPLIT_ORACLE = f"""
SELECT CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6)
                 < '{_hex_threshold(0.2)}'
            THEN 'test' ELSE 'train' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1
"""


@query("train_test_split", _SPLIT_ORACLE)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 train/test assignment via the same hash family; returns
    the split sizes (assignment itself checked row-wise by the 10%
    sample query above)."""
    o = _t(spark, sf_dir, "orders")
    return (
        train_test_split(o, "o_orderkey", test_fraction=0.2)
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# =====================================================================
# MERGE / upsert
# =====================================================================

_MERGE_ORACLE = """
WITH base AS (
    SELECT o_orderkey, o_totalprice, 'v1' AS src
    FROM orders WHERE o_orderkey % 10 < 5
), upd AS (
    SELECT o_orderkey, o_totalprice + 1000 AS o_totalprice, 'v2' AS src
    FROM orders WHERE o_orderkey % 10 BETWEEN 3 AND 7
)
SELECT * FROM upd
UNION ALL
SELECT * FROM base
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
"""


@query("merge_upsert", _MERGE_ORACLE)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics: seed a table with one key range, upsert an
    overlapping range (updated values + new keys), read back the final
    state — overlap keys hold v2 values, non-overlap v1 survives.

    The demo table gets a unique name and is dropped after the result
    is materialized (a fixed name collides with a leftover managed-
    table location when a fresh catalog reuses the warehouse dir)."""
    import uuid

    from deftunes_spark.io.writers import upsert_table

    tbl = f"merge_upsert_demo_{uuid.uuid4().hex[:8]}"
    o = _t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 10 < 5).select(
        "o_orderkey", "o_totalprice", F.lit("v1").alias("src")
    )
    upd = o.filter(
        (F.col("o_orderkey") % 10 >= 3) & (F.col("o_orderkey") % 10 <= 7)
    ).select(
        "o_orderkey",
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        F.lit("v2").alias("src"),
    )
    upsert_table(spark, base, tbl, ["o_orderkey"])
    upsert_table(spark, upd, tbl, ["o_orderkey"])
    out = spark.table(tbl).localCheckpoint()
    spark.sql(f"DROP TABLE {tbl}")
    return out


# fraction=1.0 strata keep everything outright: format(16^6) is a
# 7-hex-char literal, and comparing a 6-char md5 prefix against it
# lexicographically would silently exclude hashes >= '1'.
_STRATIFIED_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE (lang = 'en'
       AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
           < '{_hex_threshold(0.1)}')
   OR (lang = 'de'
       AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
           < '{_hex_threshold(0.5)}')
   OR lang NOT IN ('en', 'de')
"""


@query("stratified_sample_lang", _STRATIFIED_ORACLE)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic downsampling — the corpus-balancing
    op of an LLM data pipeline (downsample the dominant language,
    keep low-resource strata whole). Same md5-threshold family as
    hash_sample, threshold looked up per stratum; membership is a
    pure function of (doc_id, lang) — stable under re-runs, appends,
    repartitioning, and replayable by the oracle verbatim."""
    from deftunes_spark.ext.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    fractions = {
        lang: 0.1 if lang == "en" else (0.5 if lang == "de" else 1.0)
        for lang in langs
    }
    out = stratified_sample(docs, "lang", fractions, "doc_id")
    return out.select("doc_id", "lang")


# =====================================================================
# Embedding aggregation: per-label centroids
# =====================================================================

_CENTROID_ORACLE = """
WITH expanded AS (
    SELECT label, CAST(p AS BIGINT) AS pos,
           CAST(embedding[CAST(p AS INT) + 1] AS DOUBLE) AS val
    FROM embeddings, UNNEST(range(len(embedding))) AS t(p)
)
SELECT label, pos,
       CAST(SUM(CAST(round(val, 6) AS DECIMAL(18,6))) AS DOUBLE)
           AS comp_sum,
       CAST(COUNT(*) AS BIGINT) AS n
FROM expanded GROUP BY 1, 2
"""


@query("embedding_centroids", _CENTROID_ORACLE)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid accumulation (cluster means for corpus
    curation / IVF retraining): posexplode the vectors and aggregate
    per (label, position) — ONE shuffle keyed by (label, pos), partial
    aggregation collapses map-side, no driver-side vector math.
    Emits component SUMS + counts; components are rounded to 6
    decimals (cross-engine-stable, the cosine-oracle precedent) and
    summed as DECIMAL(18,6) — associative and exact, so the result is
    independent of partition order (the repo's money-sum rule applied
    to vector components). The mean is sum/n downstream."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "val"
            ),
        )
        .groupBy("label", F.col("pos").cast("bigint").alias("pos"))
        .agg(
            F.sum(F.round(F.col("val"), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("comp_sum"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


# =====================================================================
# Incremental aggregate maintenance
# =====================================================================

_INCR_ORACLE = """
SELECT CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))
            AS TIMESTAMP) AS month,
       o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           AS o_totalprice_total
FROM orders GROUP BY 1, 2
"""


@query("incremental_monthly_agg", _INCR_ORACLE)
def q_incremental_monthly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the serving
    aggregate is kept as mergeable partials; the latest month is
    aggregated ALONE (the only data an incremental run touches) and
    folded into the history partials by re-aggregation — counts add,
    decimal sums add. The oracle is a full recompute over all orders:
    algebraic equivalence is the property under test.

    At 100 TB the increment pass shuffles one month, not history, and
    the merge shuffle carries only aggregate rows. This is the
    incremental upgrade of the reference's rebuild-the-world dbt
    serving models (dbt_modeling/models/serving_layer/*.sql)."""
    from deftunes_spark.ext.incremental import merge_partials, partial_agg

    o = _t(spark, sf_dir, "orders").withColumn(
        "month", F.date_trunc("month", F.col("o_orderdate"))
    )
    # Single-row scalar collect: the "current run's window" an
    # orchestrator would pass in as a parameter (O3 context contract).
    cutoff = o.agg(F.max("month")).collect()[0][0]
    history = o.filter(F.col("month") < F.lit(cutoff))
    increment = o.filter(F.col("month") == F.lit(cutoff))
    keys = ["month", "o_orderstatus"]
    parts = [
        partial_agg(history, keys, ["o_totalprice"]),
        partial_agg(increment, keys, ["o_totalprice"]),
    ]
    merged = merge_partials(parts, keys, ["o_totalprice"])
    return merged.select(
        "month",
        "o_orderstatus",
        "n",
        F.col("o_totalprice_sum").cast("double").alias(
            "o_totalprice_total"
        ),
    )


# =====================================================================
# Snapshot-diff CDC
# =====================================================================

_CDC_ORACLE = """
WITH old AS (
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    WHERE o_orderkey % 7 <> 0
), new AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 42.5
                ELSE o_totalprice END AS o_totalprice,
           o_orderstatus
    FROM orders
    WHERE o_orderkey % 11 <> 0
)
SELECT CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            WHEN o.o_totalprice = n.o_totalprice
                 AND o.o_orderstatus = n.o_orderstatus THEN 'unchanged'
            ELSE 'update' END AS change_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM old o FULL OUTER JOIN new n USING (o_orderkey)
GROUP BY 1
"""


@query("snapshot_diff_cdc", _CDC_ORACLE)
def q_snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff change-data-capture: two deterministic snapshots
    of orders (key-hash carve-outs simulate rows deleted, inserted,
    and price-updated between loads) classified insert/update/delete/
    unchanged by one null-safe full-outer join on the business key —
    the change feed an incremental consumer reads. Counted per class
    for a compact checked result; row-level output is the operator's
    real product (tested in tests/)."""
    from deftunes_spark.ext.incremental import snapshot_diff

    o = _t(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = (
        o.filter(F.col("o_orderkey") % 11 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 5 == 0,
                F.col("o_totalprice") + 42.5,
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderstatus",
        )
    )
    diff = snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
