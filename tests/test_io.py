import json

from pyspark.sql import functions as F

from deftunes_spark.io import (
    fetch_rest_window,
    read_csv_landing,
    read_json_landing,
    read_json_literal,
    write_landing_csv,
    write_landing_json,
    write_table_append_or_create,
)


def test_rest_fetch_with_injected_fetcher(spark):
    captured = {}

    def fake(url):
        captured["url"] = url
        return [{"user_id": "u1", "v": 1}, {"user_id": "u2", "v": 2}]

    df = fetch_rest_window(
        spark, "http://api/users", "2020-02-01", "2020-02-29", fetcher=fake
    )
    assert captured["url"] == (
        "http://api/users?start_date=2020-02-01&end_date=2020-02-29"
    )
    assert df.count() == 2 and "user_id" in df.columns


def test_rest_fetch_rejects_non_array(spark):
    try:
        fetch_rest_window(
            spark, "u", "a", "b", fetcher=lambda _u: {"not": "a list"}
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_json_literal_roundtrip(spark):
    payload = json.dumps([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    df = read_json_literal(spark, payload)
    assert df.count() == 2
    assert set(df.columns) == {"a", "b"}


def test_landing_json_overwrite_idempotent(spark, tmp_path):
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    p1 = write_landing_json(df, str(tmp_path), "2020-02-01")
    # Re-run of same date overwrites, not duplicates (K1 idempotency).
    p2 = write_landing_json(df, str(tmp_path), "2020-02-01")
    assert p1 == p2
    back = read_json_landing(spark, p1)
    assert back.count() == 10


def test_landing_csv_all_strings(spark, tmp_path):
    df = spark.range(5).withColumn("price", F.col("id") * 1.5)
    path = write_landing_csv(df, str(tmp_path), "2020-02-01")
    back = read_csv_landing(spark, path)
    assert all(f.dataType.simpleString() == "string" for f in back.schema)
    assert back.count() == 5


def test_table_append_or_create(spark, tmp_path):
    name = "t_append_create"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    df = spark.range(6).withColumn(
        "ingest_on", F.lit("2020-02-01")
    )
    write_table_append_or_create(spark, df, name)  # create
    assert spark.table(name).count() == 6
    df2 = spark.range(4).withColumn("ingest_on", F.lit("2020-03-01"))
    write_table_append_or_create(spark, df2, name)  # append
    assert spark.table(name).count() == 10
    # Idempotent re-run of the same window with dynamic overwrite.
    write_table_append_or_create(
        spark, df2, name, overwrite_partitions=True
    )
    assert spark.table(name).count() == 10
    parts = {
        r.ingest_on for r in spark.table(name).select("ingest_on").collect()
    }
    assert parts == {"2020-02-01", "2020-03-01"}
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_upsert_table(spark):
    from deftunes_spark.io.writers import upsert_table

    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], ["k", "s", "v"]
    )
    upsert_table(spark, base, "upsert_t", ["k"])
    upd = spark.createDataFrame(
        [(2, "B", 20.0), (4, "d", 4.0)], ["k", "s", "v"]
    )
    upsert_table(spark, upd, "upsert_t", ["k"])
    got = {r.k: (r.s, r.v) for r in spark.table("upsert_t").collect()}
    assert got == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("c", 3.0), 4: ("d", 4.0)}
    # idempotent re-run of the same update batch
    upsert_table(spark, upd, "upsert_t", ["k"])
    assert spark.table("upsert_t").count() == 4
    spark.sql("DROP TABLE IF EXISTS upsert_t")
