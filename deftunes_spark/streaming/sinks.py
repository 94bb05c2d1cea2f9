"""Exactly-once streaming appends into versioned tables.

Structured Streaming's ``foreachBatch`` contract is at-least-once: a
crash between a successful batch write and the checkpoint commit
replays that batch with the SAME ``batch_id`` on restart. Exactly-once
therefore needs the SINK to make replays no-ops — precisely how
Iceberg/Delta streaming sinks work: the committed batch/epoch id rides
the table's own commit metadata, and a batch whose id is already
committed is skipped.

Here the versioned-table manifest (``io/versioned.py``) is that
commit metadata: each microbatch commits as one table version carrying
``stream_batch_id``; replay detection is a manifest scan (bounded by
retention), and the append itself inherits the optimistic-concurrency
retry, so a concurrent batch writer on the same table cannot corrupt
the stream's appends.

100 TB shape: one commit per microbatch, no small-file accretion
beyond what the batch interval dictates — ``ext.layout.compact_path``
plus ``expire_versions`` are the standing maintenance pair.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from deftunes_spark.io.versioned import (
    CommitProtocol,
    list_versions,
    read_version,
    write_versioned,
)


def stream_id_for_checkpoint(checkpoint_dir: str) -> str:
    """Stable identity of one stream's progress: the checkpoint is
    what makes batch ids meaningful, so its (absolute) path hashes to
    the stream id that scopes replay detection. A restart on the same
    checkpoint keeps the id; a fresh checkpoint is a NEW stream whose
    batch numbering starts over."""
    # URI checkpoints (s3a://, hdfs://) hash verbatim — abspath would
    # prepend the LOCAL cwd, making the id depend on where the driver
    # happened to launch and breaking replay detection across
    # restarts. Only bare local paths get canonicalized.
    key = (
        checkpoint_dir
        if "://" in checkpoint_dir
        else os.path.abspath(checkpoint_dir)
    )
    return hashlib.md5(key.encode("utf-8")).hexdigest()[:16]


def versioned_batch_writer(
    path: str,
    protocol: CommitProtocol | None = None,
    stream_id: str = "adhoc",
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function committing each microbatch as one
    versioned-table append, idempotent under batch replay.

    Skip rule: if a published manifest already carries this
    ``(stream_id, stream_batch_id)`` pair, the batch was fully
    committed before the failure — do nothing. (The converse crash,
    commit-then-replay, is the only at-least-once anomaly
    ``foreachBatch`` has; partial writes cannot be visible because a
    version only exists once its manifest publishes.)

    ``stream_id`` scopes the skip to ONE stream's batch numbering —
    Spark batch ids are only unique per checkpoint, so two streams
    (or one stream restarted on a fresh checkpoint) writing the same
    table must not skip each other's ids. This is the same composite
    key Iceberg/Delta streaming sinks commit ((queryId, epochId));
    ``stream_to_versioned_table`` derives it from the checkpoint via
    ``stream_id_for_checkpoint``.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        committed = {
            (m.get("stream_id"), m.get("stream_batch_id"))
            for m in list_versions(spark, path)
        }
        if (stream_id, batch_id) in committed:
            return
        write_versioned(
            spark,
            batch_df,
            path,
            mode="append",
            protocol=protocol,
            extra={"stream_id": stream_id, "stream_batch_id": batch_id},
        )

    return _write


def stream_to_versioned_table(
    spark: SparkSession,
    source_dir: str,
    schema,
    table_path: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    protocol: CommitProtocol | None = None,
    query_name: str = "deftunes_versioned_sink",
) -> DataFrame:
    """Drive a file-source stream to completion (availableNow) into a
    versioned table and return the final snapshot.

    One call == one exactly-once catch-up run: the checkpoint tracks
    consumed source files, the manifest tracks committed batches, and
    either half crashing leaves a state the next call completes
    without duplication. ``max_files_per_trigger`` splits the backlog
    into multiple microbatches (one table version each).
    """
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="deftunes_vsink_ckpt_")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.foreachBatch(
            versioned_batch_writer(
                table_path,
                protocol,
                stream_id=stream_id_for_checkpoint(checkpoint_dir),
            )
        )
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_version(spark, table_path)
