"""Serving-layer star schema + BI views (SURVEY §2.4/§2.5).

Spark-first re-expression of the dbt models
(``dbt_modeling/models/serving_layer/*.sql`` and ``bi_views/*.sql``):
three dims + one fact + two aggregate views. Joins are star-shaped —
big fact × small dim — so every dim side carries an explicit
``broadcast`` hint: at 100 TB the fact never shuffles for these joins,
and the aggregation is a single map-side-combined hash aggregate.

Money aggregates are summed as DECIMAL then surfaced as DOUBLE —
decimal addition is associative/exact, so results are deterministic
under any partitioning (a float sum would drift with partition order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_users(users_silver: DataFrame) -> DataFrame:
    """dbt dim_users.sql:1-8 — projection of the flattened users table."""
    return users_silver.select(
        "user_id",
        "user_lastname",
        "user_name",
        "user_since",
        "place_name",
        "country_code",
    )


def dim_songs(songs_silver: DataFrame) -> DataFrame:
    """dbt dim_songs.sql:1-7."""
    return songs_silver.select("song_id", "track_id", "title", "release", "year")


def dim_artists(songs_silver: DataFrame) -> DataFrame:
    """dbt dim_artists.sql:1-5 — DISTINCT dedup of the denormalized songs."""
    return songs_silver.select(
        "artist_id", "artist_mbid", "artist_name"
    ).distinct()


def fact_session(sessions_silver: DataFrame) -> DataFrame:
    """dbt fact_session.sql:1-10 — one row per purchased item."""
    return sessions_silver.select(
        "session_id",
        "user_id",
        "song_id",
        "artist_id",
        "price",
        "liked",
        "liked_since",
        "session_start_time",
    )


def sales_per_artist(fact: DataFrame, artists: DataFrame) -> DataFrame:
    """bi_views/sales_per_artist_vw.sql:1-8 (J1 + A1 + F1).

    fact LEFT JOIN dim_artists, SUM(price) per (year, artist_name).
    """
    return (
        fact.join(F.broadcast(artists), "artist_id", "left")
        .groupBy(
            F.year("session_start_time").cast("long").alias("session_year"),
            F.col("artist_name"),
        )
        .agg(
            F.sum(F.col("price").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_sales")
        )
    )


def sales_per_country(fact: DataFrame, users: DataFrame) -> DataFrame:
    """bi_views/sales_per_country_vw.sql:1-9 (J2 + A2 + F1/F2)."""
    return (
        fact.join(F.broadcast(users), "user_id", "left")
        .groupBy(
            F.month("session_start_time").cast("long").alias("session_month"),
            F.year("session_start_time").cast("long").alias("session_year"),
            F.col("country_code"),
        )
        .agg(
            F.sum(F.col("price").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_sales")
        )
    )
