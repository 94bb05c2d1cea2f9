"""Sources / scans (SURVEY §2.1, S1–S7).

Re-creations of the reference's ingest surface on stock Spark readers:

- S1 REST window fetch  (api-extract-job.py:34-40,53-60)
- S2 JSON-literal → DataFrame (api-extract-job.py:63)
- S3 JDBC table scan    (extract-songs-job.py:30-38)
- S4 JSON directory scan (transform-json-job.py:70-75)
- S5 CSV directory scan, header, all-string (transform-songs-job.py:62-81)
- S6/S7 catalog scan + introspection (spark.table / spark.catalog)

All readers return plain DataFrames; schema inference at landing,
explicit enforcement later (transforms layer) — mirroring the
reference's inferred-then-enforced schema system (SURVEY §1.3).
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The shared driver testdata tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one shared-testdata parquet table (columnar, pushdown-able)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


# --- S1: REST API window fetch -------------------------------------------
def fetch_rest_window(
    spark: SparkSession,
    api_url: str,
    start_date: str,
    end_date: str,
    fetcher: Callable[[str], list[dict]] | None = None,
) -> DataFrame:
    """GET ``{url}?start_date=&end_date=`` → DataFrame.

    Same contract as the reference's ``fetch_data_from_api``
    (api-extract-job.py:34-40): non-200 raises, body must be a JSON
    array. ``fetcher`` is injectable so tests (and offline runs) can
    supply a deterministic fake; the default uses ``requests`` if
    present. The fetch is driver-side (the payload is one monthly
    increment — small by construction); distribution happens at the
    next stage when the landing write repartitions.
    """
    url = f"{api_url}?start_date={start_date}&end_date={end_date}"
    if fetcher is None:
        try:
            import requests  # noqa: PLC0415
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "no HTTP client available; pass fetcher= explicitly"
            ) from exc

        def fetcher(u: str) -> list[dict]:
            resp = requests.get(u, timeout=60)
            if resp.status_code != 200:
                raise RuntimeError(f"API returned {resp.status_code} for {u}")
            return resp.json()

    rows = fetcher(url)
    if not isinstance(rows, list):
        raise ValueError("API payload must be a JSON array of records")
    return read_json_literal(spark, json.dumps(rows))


# --- S2: JSON literal → DataFrame ----------------------------------------
def read_json_literal(spark: SparkSession, payload: str) -> DataFrame:
    """Parallelize a JSON string and infer schema (api-extract-job.py:63)."""
    return spark.read.json(spark.sparkContext.parallelize([payload]))


# --- S3: JDBC table scan --------------------------------------------------
def read_jdbc_table(
    spark: SparkSession,
    url: str,
    dbtable: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Full scan of a relational table via JDBC (extract-songs-job.py:30-38).

    At scale, pass ``partition_column``/bounds so the scan fans out to
    ``num_partitions`` parallel range queries instead of a single
    connection — the Glue DynamicFrame equivalent hid this knob.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


# --- S4: JSON directory scan ---------------------------------------------
def read_json_landing(spark: SparkSession, path: str) -> DataFrame:
    """Read one landing JSON dir, schema inferred (transform-json-job.py:70-75)."""
    return spark.read.json(path)


# --- S5: CSV directory scan ----------------------------------------------
def read_csv_landing(spark: SparkSession, path: str) -> DataFrame:
    """Landing CSV: header, quote ``"``, all columns as strings.

    Mirrors the DynamicFrame read + ``.toDF()`` (transform-songs-job.py:
    62-81) without the Glue-proprietary choice types: every column
    lands as string; the transform layer casts (P4).
    """
    return (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("sep", ",")
        .option("recursiveFileLookup", True)
        .csv(path)
    )


# --- Evolved-schema parquet read -----------------------------------------
def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with ``mergeSchema=true``: the union schema across
    all footers, so a directory whose files were written before AND
    after a column was added reads as one frame (older files yield
    NULL). This is the path-based counterpart of
    ``write_table_append_evolve`` — together they re-express the
    Iceberg format-v2 schema-evolution semantics the reference relies
    on (transform-json-job.py:156-187). Footer merging scans every
    file's metadata, so it is off by default in Spark; reserve it for
    evolved directories (catalog tables carry their schema instead)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


# --- S6/S7: catalog scan + introspection ---------------------------------
def table_exists(spark: SparkSession, table: str) -> bool:
    """Existence probe driving append-vs-create (transform-json-job.py:147-151)."""
    return spark.catalog.tableExists(table)
