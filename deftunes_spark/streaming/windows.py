"""Structured Streaming face of the incremental pipeline (SURVEY §7.8).

The reference is batch-incremental (monthly Airflow windows); these
operators give the same windowed semantics in both modes over the
``events`` table:

- tumbling/sliding window aggregation (batch ``F.window`` and
  streaming with watermark — identical results for on-time data)
- gap-based sessionization (batch via lag/cumsum window functions;
  streaming via ``F.session_window``)

``run_stream_once`` drives a file-source stream with
``Trigger.availableNow`` — the Structured-Streaming equivalent of one
backfill window run.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling_agg_batch(
    events: DataFrame, width: str = "1 hour"
) -> DataFrame:
    """Per-(window, event_type) counts and value sums. Deterministic:
    decimal-exact sum surfaced as double."""
    return (
        events.groupBy(
            F.window("ts", width).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def tumbling_agg_stream(
    stream: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming variant: watermarked state so late data beyond
    ``watermark`` is dropped and state is bounded."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sliding_agg_batch(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window counts/sums: each event lands in width/slide
    overlapping windows (``F.window`` emits one row per covering
    window — Spark expands this JVM-side, no UDF)."""
    return (
        events.groupBy(
            F.window("ts", width, slide).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sessionize_batch(
    events: DataFrame, gap_minutes: int = 30, user_col: str = "user_id"
) -> DataFrame:
    """Gap-based sessionization, batch form.

    New session when the gap to the previous event of the same user
    exceeds ``gap_minutes``; session id = cumulative count of session
    starts per user (lag + conditional cumsum — two window passes over
    the same user partitioning, one shuffle)."""
    by_user = Window.partitionBy(user_col).orderBy("ts")
    # Microsecond precision: a cast("long") truncates to whole
    # seconds, silently merging sessions whose gap only exceeds the
    # threshold by the sub-second part — and diverging from the
    # stateful operator, which compares full timestamps.
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(by_user)
    is_start = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(is_start).over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def session_stats_batch(
    events: DataFrame, gap_minutes: int = 30, user_col: str = "user_id"
) -> DataFrame:
    """Per-session stats over the sessionized stream."""
    s = sessionize_batch(events, gap_minutes, user_col)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def run_stream_once(
    spark: SparkSession,
    source_dir: str,
    schema,
    transform,
    checkpoint_dir: str | None = None,
    output_mode: str = "complete",
    query_name: str = "deftunes_stream_once",
) -> DataFrame:
    """Run a file-source stream to completion with availableNow and
    return the result as a DataFrame (memory sink).

    This is O2's streaming face: one call == one catch-up run over
    everything unprocessed, exactly-once via the checkpoint.
    ``output_mode``: "complete" for unwatermarked aggregations,
    "append" for stateful operators (applyInPandasWithState)."""
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="deftunes_ckpt_")
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
