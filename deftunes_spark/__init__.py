"""deftunes_spark — a PySpark-native analytics/ETL engine.

Re-creates the semantics of the DeFtunes data pipeline reference
(Glue + Iceberg + Redshift/dbt + Airflow + Glue Data Quality) as an
idiomatic, standalone PySpark engine:

- ``io``         multi-source readers (JSON/CSV/parquet/JDBC/REST) and
                 partitioned, idempotent, append-or-create writers
- ``transforms`` cleansing transforms (type enforcement, array/struct
                 unnesting, lineage metadata)
- ``models``     star-schema modeling layer (dims + fact + BI views)
                 with a dbt-like model registry
- ``quality``    DQDL-subset rule engine (IsComplete, ColumnLength,
                 Uniqueness, ColumnValues) evaluated in one pass
- ``pipeline``   lightweight DAG runner with monthly windows, catchup
                 backfill, retries, and DQ gates
- ``ext``        scale-out operators: dedup (exact/minhash/simhash),
                 similarity search, text analysis, multimodal columns
- ``streaming``  Structured Streaming face of the incremental pipeline

Design target: 100 TB on a multi-executor cluster. Everything is
DataFrame/Catalyst-first; Python UDFs appear only where built-ins
genuinely cannot express the semantics (Arrow-batched when they do).
"""

__version__ = "0.1.0"

from deftunes_spark.session import get_spark  # noqa: F401
