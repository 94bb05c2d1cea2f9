import datetime as dt

from pyspark.sql import types as T

from deftunes_spark.transforms import (
    add_lineage_columns,
    sessions_explode,
    songs_enforce_schema,
    users_flatten,
)


def test_users_flatten_positional(users_landing):
    out = users_flatten(users_landing)
    assert "user_location" not in out.columns
    for c in ("latitude", "longitude", "place_name", "country_code", "timezone"):
        assert c in out.columns
    row = out.filter(out.user_name == "Name0").first()
    # Positional: [lat, lon, place, country, tz]; stays string.
    assert row.latitude == "40.1"
    assert row.country_code == "US"
    assert isinstance(row.latitude, str)


def test_sessions_explode_one_row_per_item(sessions_landing):
    out = sessions_explode(sessions_landing)
    n_items = sum(
        len(r.session_items) for r in sessions_landing.collect()
    )
    assert out.count() == n_items
    # struct fields flattened + renamed; timestamp parsed by built-in.
    assert {"song_id", "artist_name", "price", "liked"} <= set(out.columns)
    ts_field = out.schema["session_start_time"].dataType
    assert isinstance(ts_field, T.TimestampType)
    first = out.filter(out.session_id.endswith("03e8")).first()
    assert first.session_start_time == dt.datetime(2020, 1, 1, 12, 0)


def test_sessions_explode_session_id_repeats(sessions_landing):
    """Multi-item sessions: declared-unique session_id is violated by
    construction (SURVEY §2.5 note)."""
    out = sessions_explode(sessions_landing)
    dup = (
        out.groupBy("session_id").count().filter("count > 1").count()
    )
    assert dup > 0


def test_songs_enforce_schema_casts(songs_landing):
    out = songs_enforce_schema(songs_landing)
    schema = {f.name: f.dataType for f in out.schema.fields}
    assert isinstance(schema["duration"], T.FloatType)
    assert isinstance(schema["year"], T.IntegerType)
    assert isinstance(schema["track_id"], T.StringType)
    row = out.filter(out.title == "Title 1").first()
    assert abs(row.duration - 121.5) < 1e-6
    assert row.shs_perf == -1


def test_add_lineage_columns(songs_landing):
    out = add_lineage_columns(
        songs_landing,
        ingest_date="2020-03-01",
        processing_timestamp="2020-03-01T00:00:00",
        source_from="postgres_rds",
    )
    row = out.first()
    assert row.ingest_on == dt.date(2020, 3, 1)
    assert row.source_from == "postgres_rds"
    assert isinstance(out.schema["ingest_on"].dataType, T.DateType)
