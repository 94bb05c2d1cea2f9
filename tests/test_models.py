from pyspark.sql import functions as F

from deftunes_spark.models import (
    Model,
    ModelRegistry,
    dim_artists,
    fact_session,
    sales_per_artist,
)
from deftunes_spark.transforms import sessions_explode, songs_enforce_schema


def test_dim_artists_distinct(songs_landing):
    songs = songs_enforce_schema(songs_landing)
    artists = dim_artists(songs)
    # 20 songs over 5 artists → 5 dim rows (+ nulls seeded on artist_id).
    ids = [r.artist_id for r in artists.collect()]
    assert len(ids) == len(set(ids))
    assert artists.columns == ["artist_id", "artist_mbid", "artist_name"]


def test_sales_per_artist_values(sessions_landing, songs_landing):
    fact = fact_session(sessions_explode(sessions_landing))
    artists = dim_artists(songs_enforce_schema(songs_landing))
    view = sales_per_artist(fact, artists)
    # Cross-check one cell against a hand computation.
    expected = (
        fact.join(artists, "artist_id", "left")
        .filter(F.year("session_start_time") == 2020)
        .agg(F.sum("price"))
        .collect()[0][0]
    )
    total = (
        view.filter(view.session_year == 2020)
        .agg(F.sum("total_sales"))
        .collect()[0][0]
    )
    assert abs(total - expected) < 1e-6
    assert view.columns == ["session_year", "artist_name", "total_sales"]


def test_registry_topo_and_views(spark, sessions_landing):
    reg = ModelRegistry(variables={"schema": "serving"})
    exploded = sessions_explode(sessions_landing)
    exploded.createOrReplaceTempView("silver_sessions")
    reg.add(
        Model(
            name="fact_session",
            sql=(
                "SELECT session_id, user_id, song_id, artist_id, price, "
                "liked, liked_since, session_start_time FROM silver_sessions"
            ),
        )
    )
    reg.add(
        Model(
            name="sales_total",
            sql=(
                "SELECT CAST(year(session_start_time) AS BIGINT) AS y, "
                "SUM(price) AS total FROM {0} GROUP BY 1".format(
                    "fact_session"
                )
            ),
            refs=("fact_session",),
            materialized="view",
        )
    )
    order = reg.topo_order()
    assert order.index("fact_session") < order.index("sales_total")
    built = reg.run(spark)
    assert built == order
    assert spark.table("sales_total").count() > 0


def test_registry_rejects_cycles_and_dupes():
    reg = ModelRegistry()
    reg.add(Model(name="a", sql="SELECT 1"))
    try:
        reg.add(Model(name="a", sql="SELECT 2"))
        raise AssertionError("expected duplicate rejection")
    except ValueError:
        pass
