"""Round-10 operators: deterministic training-shard export + manifest
(the pipeline's missing last stage — r9 verdict #6).

Each entry follows the registry contract: a Spark builder plus a
DuckDB value-hash oracle mirroring the full chain."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from deftunes_spark.driver_queries import _t_cpu, query

_N_SHARDS = 16

_WS = "[ \\t\\n\\x0B\\f\\r]+"

# The oracle recomputes the manifest from the SOURCE relation with the
# same engine-portable md5 derivations the export writes with; the
# Spark side computes it from the WRITTEN FILES READ BACK — a hash
# match therefore proves shard assignment, write/read integrity, token
# accounting, and content identity in one check.
_SHARD_MANIFEST_ORACLE = f"""
SELECT CAST(('0x' || substr(md5('exp|' || CAST(doc_id AS VARCHAR)),
           1, 8))::BIGINT % {_N_SHARDS} AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(len(list_filter(regexp_split_to_array(
           trim(coalesce(text, '')), '{_WS}'), x -> x <> '')))
           AS BIGINT) AS n_tokens,
       CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
           || CASE WHEN text IS NULL THEN 'N' ELSE 'V' END || '|'
           || coalesce(text, '')), 1, 10))::BIGINT) AS BIGINT)
           AS content_hash
FROM documents
GROUP BY 1
"""


@query("shard_export_manifest", _SHARD_MANIFEST_ORACLE)
def q_shard_export_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Training-shard export roundtrip (ext.export): write the
    documents table as {n} deterministic md5-hash-mod parquet shards
    (one pass, ONE shuffle keyed on the shard id, exactly one file
    per shard), read the shard directory back, and emit the manifest
    — per-shard row count, whitespace-token count, and the
    order-independent 40-bit-md5-sum content hash. The oracle
    recomputes all four columns from the source relation in pure SQL,
    so the value-hash match proves the written files carry exactly
    the source rows (nothing dropped, duplicated, re-sharded, or
    altered). Idempotent-rewrite + one-file-per-shard pinned in
    tests/test_export.py."""
    from deftunes_spark.ext.export import shard_export, shard_manifest

    docs = _t_cpu(spark, sf_dir, "documents").select("doc_id", "text")
    path = tempfile.mkdtemp(prefix="deftunes_shardexp_") + "/docs"
    shard_export(docs, path, n_shards=_N_SHARDS)
    return shard_manifest(spark.read.parquet(path))
