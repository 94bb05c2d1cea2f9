"""Cleansing transforms (SURVEY §2.3/§2.7).

Each function is the Spark-first re-expression of one reference
transform job stage — pure ``DataFrame -> DataFrame``, fully
Catalyst-optimizable (no Python UDFs in the hot path; the reference's
ISO-timestamp Python UDF at transform-json-job.py:61-64 is replaced by
the built-in ``to_timestamp``, which parses ISO-8601 natively and keeps
whole-stage codegen intact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Positional layout of the users' location array
# (transform-json-job.py:83-90): [lat, lon, place, country, tz].
USER_LOCATION_FIELDS = (
    "latitude",
    "longitude",
    "place_name",
    "country_code",
    "timezone",
)

SESSION_ITEM_FIELDS = (
    "song_id",
    "song_name",
    "artist_id",
    "artist_name",
    "price",
    "currency",
    "liked",
    "liked_since",
)


def add_lineage_columns(
    df: DataFrame,
    ingest_date: str,
    processing_timestamp: str | None = None,
    source_from: str | None = None,
) -> DataFrame:
    """P3/F3: systematic metadata columns.

    ``ingest_on`` partition date (transform-json-job.py:79-81),
    ``processing_timestamp`` literal (:101-108), and optional
    ``source_from`` provenance (transform-songs-job.py:95).
    """
    df = df.withColumn("ingest_on", F.to_date(F.lit(ingest_date), "yyyy-MM-dd"))
    if processing_timestamp is not None:
        df = df.withColumn("processing_timestamp", F.lit(processing_timestamp))
    if source_from is not None:
        df = df.withColumn("source_from", F.lit(source_from))
    return df


def users_flatten(df: DataFrame) -> DataFrame:
    """P5/P6: destructure the positional ``user_location`` array.

    ``user_location[i]`` → five string columns, then drop the array
    (transform-json-job.py:83-90). Elements stay strings — the
    reference does not cast lat/lon (SURVEY §7 hard-parts note).
    """
    loc = F.col("user_location")
    for i, name in enumerate(USER_LOCATION_FIELDS):
        df = df.withColumn(name, loc[i])
    return df.drop("user_location")


def sessions_explode(df: DataFrame) -> DataFrame:
    """F5/F6/P2/F4: unnest ``session_items`` and flatten its struct.

    One output row per purchased song (transform-json-job.py:110-129):
    ``explode(session_items)`` then eight ``session_item.X`` field
    projections with rename, plus ``session_start_time`` parsed from
    ISO-8601 by the built-in ``to_timestamp`` (replacing the
    reference's Python UDF, transform-json-job.py:61-64 — identical
    semantics, Catalyst-visible).
    """
    exploded = df.withColumn("session_item", F.explode("session_items"))
    item_cols = [
        F.col(f"session_item.{f}").alias(f) for f in SESSION_ITEM_FIELDS
    ]
    passthrough = [
        c
        for c in df.columns
        if c not in ("session_items", "session_start_time")
    ]
    return exploded.select(
        *[F.col(c) for c in passthrough],
        F.to_timestamp("session_start_time").alias("session_start_time"),
        *item_cols,
    )


SONGS_CASTS: dict[str, str] = {
    # transform-songs-job.py:83-91 — landing CSV arrives all-string.
    "duration": "float",
    "artist_familiarity": "float",
    "artist_hotttnesss": "float",
    "year": "int",
    "track_7digitalid": "int",
    "shs_perf": "int",
    "shs_work": "int",
}


def songs_enforce_schema(df: DataFrame) -> DataFrame:
    """P4: explicit type enforcement on the all-string CSV landing read."""
    cols: list[Column] = []
    for c in df.columns:
        if c in SONGS_CASTS:
            cols.append(F.col(c).cast(SONGS_CASTS[c]).alias(c))
        else:
            cols.append(F.col(c))
    return df.select(*cols)
