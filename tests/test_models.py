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


def test_versioned_table_materialization_time_travel(spark, tmp_path):
    """versioned_table models: every run() commits a new version; old
    snapshots stay readable through read_model_version, and two
    rebuilds racing from threads both commit (distinct versions, no
    corruption) — the Iceberg guarantees surfaced at the registry
    level."""
    import threading

    from pyspark.sql import functions as F

    from deftunes_spark.io.versioned import list_versions

    src = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("seg")
    )
    src.createOrReplaceTempView("vt_src")

    def registry(mult: int) -> ModelRegistry:
        reg = ModelRegistry(
            variables={"mult": str(mult)},
            versioned_base_path=str(tmp_path),
        )
        reg.add(
            Model(
                name="agg",
                sql=(
                    "SELECT seg, CAST(SUM(id) * {mult} AS BIGINT) AS s "
                    "FROM vt_src GROUP BY seg"
                ),
                materialized="versioned_table",
            )
        )
        return reg

    reg1 = registry(1)
    reg1.run(spark)
    registry(10).run(spark)

    v0 = {
        r.seg: r.s
        for r in reg1.read_model_version(spark, "agg", version=0).collect()
    }
    latest = {
        r.seg: r.s for r in reg1.read_model_version(spark, "agg").collect()
    }
    assert latest == {k: v * 10 for k, v in v0.items()}

    # Two rebuilds racing from threads: both must commit, as distinct
    # versions, each internally consistent (its own multiplier).
    errs = []

    def rebuild(mult):
        try:
            registry(mult).run(spark)
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    ts = [threading.Thread(target=rebuild, args=(m,)) for m in (100, 1000)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    versions = list_versions(spark, str(tmp_path) + "/serving_agg")
    assert [m["version"] for m in versions] == [0, 1, 2, 3]
    for v in (2, 3):
        snap = {
            r.seg: r.s
            for r in reg1.read_model_version(
                spark, "agg", version=v
            ).collect()
        }
        mult = next(
            m for m in (100, 1000) if snap == {k: x * m for k, x in v0.items()}
        )
        assert mult in (100, 1000)


def test_versioned_table_requires_base_path(spark):
    reg = ModelRegistry()
    reg.add(
        Model(name="m", sql="SELECT 1 AS x", materialized="versioned_table")
    )
    try:
        reg.run(spark)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
