"""Training-shard export — the last stage of the pipeline.

The reference capstone ends at curated warehouse tables (Glue
transform jobs → Iceberg tables → dbt models,
``terraform/assets/transform_jobs/de-c4w4a2-transform-songs-job.py``);
a pretraining ingest additionally needs the curated corpus written
back out as TRAINING-READY SHARDS: a bounded number of
deterministic, content-addressed parquet shards plus a manifest the
loader (and the auditor) can verify against the source relation.

Design for 100 TB:

- **Deterministic assignment, no RNG**: ``shard = md5('exp|' || id)
  mod n_shards`` — engine-portable (the DuckDB oracle recomputes it
  verbatim), stable across reruns/retries, and independent of
  partitioning or row order. A re-export of the same relation is
  byte-identical in membership, so failed jobs are safely re-run
  (idempotent overwrite, pytest-pinned).
- **One pass, one shuffle**: a single ``repartition(shard)`` keyed
  on the shard id co-locates each shard's rows, then
  ``partitionBy(shard)`` writes exactly one file per shard instead
  of tasks × shards small files. n_shards scales with the corpus
  (callers size it as corpus_rows / target_rows_per_shard); the
  shuffle is hash-balanced by construction since the shard id is
  itself a uniform hash.
- **Verifiable manifest**: per shard — row count, whitespace-token
  count (the packer's explicit-class rule, one definition away from
  drift), and an ORDER-INDEPENDENT content hash: the per-shard SUM
  of 40-bit md5 prefixes over ``id|null-flag|text``. Sums commute,
  so the hash is independent of file layout and scan order, fits in
  BIGINT headroom (2^40 × rows), and is recomputable in ANSI SQL —
  the manifest is a FULL value-hash oracle query, not a trust-me
  sidecar. The null flag keeps ``NULL`` text distinct from ``''``.

The driver query (``shard_export_manifest``) computes the manifest
from the WRITTEN FILES READ BACK, so a green artifact row proves
write+read integrity and manifest math in one check (the K1/K2
roundtrip pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = "[ \\t\\n\\x0B\\f\\r]+"


def _shard_col(id_col: str, n_shards: int) -> F.Column:
    """Deterministic md5-derived shard id (mirrored in SQL oracles as
    ``('0x' || substr(md5('exp|' || CAST(id AS VARCHAR)), 1, 8))
    ::BIGINT % n``)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("exp|"), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % n_shards
    ).cast("int")


def _row_fingerprint(id_col: str, text_col: str) -> F.Column:
    """40-bit md5 prefix of ``id|flag|text`` — summed per shard for
    the order-independent content hash. 40 bits keeps per-shard sums
    far inside BIGINT even at 10^6 rows per shard."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit("|"),
                    F.when(
                        F.col(text_col).isNull(), F.lit("N")
                    ).otherwise(F.lit("V")),
                    F.lit("|"),
                    F.coalesce(F.col(text_col), F.lit("")),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("bigint")


def _token_count(text_col: str) -> F.Column:
    toks = F.filter(
        F.split(
            F.trim(F.coalesce(F.col(text_col), F.lit(""))), _WS
        ),
        lambda t: t != "",
    )
    return F.size(toks).cast("long")


def shard_export(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_shards`` deterministic parquet shards under
    ``path`` (directory layout ``shard=<i>/``), one pass, one
    shuffle. See the module docstring for the scale contract."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    out = df.withColumn("shard", _shard_col(id_col, n_shards))
    (
        out.repartition(n_shards, F.col("shard"))
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def shard_manifest(
    shards: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Manifest over a shard relation (normally the read-back of a
    :func:`shard_export` directory, where ``shard`` is the partition
    column): per shard — row count, whitespace-token count, and the
    order-independent content hash. Pure SQL over the rows, so a
    DuckDB oracle recomputes it from the SOURCE relation and a match
    proves no row was dropped, duplicated, re-sharded, or altered in
    flight."""
    return (
        shards.groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(_token_count(text_col))
            .cast("bigint")
            .alias("n_tokens"),
            F.sum(_row_fingerprint(id_col, text_col))
            .cast("bigint")
            .alias("content_hash"),
        )
    )
